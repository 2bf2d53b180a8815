"""Beyond-int32 indexes on the DEVICE path (VERDICT r4 next #5).

A force_wide (int64-table) index is served by position-range sharding:
global positions ride int64 (x64 mode) while every HBM gather is
int32-addressed into a shard-local slice. Run in a subprocess with
JAX_ENABLE_X64=1 so the x64 flag never leaks into the main test
process; inside, the sharded TPU-path SAM must be byte-identical to
the 64-bit CPU engine's on the same index (the engines share the
native post-seed runtime, so this pins the whole wide seed stage).

The REAL n > 2^31 demonstration runs in tools/bigserve.py against the
bigbuild index (documented in BASELINE.md); this test pins the exact
same code path — dtype-driven, not n-driven — at test scale.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os
import numpy as np
import jax
assert jax.config.jax_enable_x64
from monitpu.index import build_index
from monitpu.index.alphabet import decode_seq, revcomp_codes
from monitpu.align.aligner import Aligner, AlignConfig

rng = np.random.default_rng(91)
base = rng.integers(1, 5, size=30_000, dtype=np.int8)
seqs = []
for _ in range(3):
    s = base.copy()
    p = rng.integers(0, s.size, size=s.size // 120)
    s[p] = rng.integers(1, 5, size=p.size)
    seqs.append(s)
idx = build_index(seqs, already_encoded=True, force_wide=True)
assert idx.run_starts.dtype == np.int64

reads = []
for b in range(32):
    hap = b % 3
    L = int(rng.integers(60, 128))
    s = int(rng.integers(0, len(seqs[hap]) - L))
    codes = seqs[hap][s:s + L].copy()
    codes[rng.integers(0, L, 2)] = rng.integers(1, 5, 2)
    if b % 2:
        codes = revcomp_codes(codes.astype(np.int8))
    reads.append((f"r{b}", decode_seq(codes.astype(np.int8)), "I" * L))

cfg = AlignConfig(max_occs=32, postseed_threads=2)
cpu = Aligner(idx, AlignConfig(engine="cpu", max_occs=32,
                               postseed_threads=2))
want, _ = cpu.complete_batch_sam(cpu.submit_batch(reads))

sh = Aligner(idx, cfg)     # table_layout auto -> sharded (int64 dtype)
assert sh._index_mesh is not None, "wide index must auto-shard"
got, _ = sh.complete_batch_sam(sh.submit_batch(reads))
assert sh.stats.get("extz_device_batches", 0) >= 1
assert got == want, "wide sharded SAM != 64-bit CPU engine SAM"
print("WIDE-SHARDED-OK", len(got))
"""


def test_wide_index_sharded_end_to_end():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-c", SCRIPT], env=env, cwd=REPO,
                       capture_output=True, timeout=900)
    assert p.returncode == 0, p.stderr.decode()[-3000:]
    assert b"WIDE-SHARDED-OK" in p.stdout
