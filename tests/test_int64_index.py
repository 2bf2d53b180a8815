"""64-bit index path: tables in int64 (pangenome scale, n >= 2^31).

The reference indexes beyond 2^31 by switching to 64-bit binaries
(pipeline/moni.in:195-204); monitpu switches table dtypes in
build_index_from_sa and routes the CPU engine through the _w64 seed
kernel. Exercised here on small data via force_wide: the wide index
must produce byte-identical SAM through the CPU engine; the device
path serves it via position-range sharding under x64
(tests/test_shard_index_wide.py) and refuses loudly without x64.
"""

import numpy as np
import pytest

from monitpu.index import build_index
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.index.alphabet import decode_seq, revcomp_codes


def _reads(idx, rng, n_reads=64):
    reads = []
    for i in range(n_reads):
        s = int(rng.integers(0, idx.n - 160))
        codes = idx.text[s:s + 150].copy()
        codes[rng.integers(0, 150, 2)] = rng.integers(1, 5, 2)
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append((f"r{i}", decode_seq(codes), "I" * 150))
    return reads


def test_wide_index_cpu_engine_sam_identity(rng):
    base = rng.integers(1, 5, size=80000, dtype=np.int8)
    h2 = base.copy()
    h2[rng.integers(0, 80000, 160)] = rng.integers(1, 5, 160)
    narrow = build_index([base, h2], names=["a", "b"], already_encoded=True)
    wide = build_index([base, h2], names=["a", "b"], already_encoded=True,
                       force_wide=True)
    assert wide.run_starts.dtype == np.int64
    assert narrow.run_starts.dtype == np.int32
    assert wide.r == narrow.r and wide.n == narrow.n
    reads = _reads(narrow, rng)
    a32 = Aligner(narrow, AlignConfig(engine="cpu", postseed_threads=2))
    a64 = Aligner(wide, AlignConfig(engine="cpu", postseed_threads=2))
    sam32, _ = a32.complete_batch_sam(a32.submit_batch(reads))
    sam64, _ = a64.complete_batch_sam(a64.submit_batch(reads))
    assert sam32 == sam64
    assert a64.stats["aligned"] == len(reads)


def test_wide_index_device_path_routes_to_sharding(rng):
    """Since round 5 the device path SERVES wide indexes via position-
    range sharding (tests/test_shard_index_wide.py pins end-to-end SAM
    parity under x64). Without x64 the Aligner must refuse LOUDLY at
    construction (silent int64->int32 downcasts would corrupt
    positions); the replicated staging path refuses too."""
    import jax
    from monitpu.ops.ms import prepare_tables
    base = rng.integers(1, 5, size=20000, dtype=np.int8)
    wide = build_index([base], names=["a"], already_encoded=True,
                       force_wide=True)
    with pytest.raises(NotImplementedError):
        prepare_tables(wide)
    if not jax.config.jax_enable_x64:
        with pytest.raises(RuntimeError):
            Aligner(wide, AlignConfig())
