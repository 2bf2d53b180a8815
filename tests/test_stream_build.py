"""Streaming memory-light build == direct build, array for array.

The streaming builder (index/stream_build.py) must write a
<prefix>.monitpu.npz whose every table equals build_index()'s output
exactly — same dtypes, same threshold tie-breaks, same Phi-anchor
garbage conventions — for both the int32 and forced-int64 paths."""

import dataclasses

import numpy as np
import pytest

from monitpu.index import build_index, MoniIndex
from monitpu.index.stream_build import build_index_streaming


def _pangenome(rng, n=40_000, haps=3):
    base = rng.integers(1, 5, size=n, dtype=np.int8)
    seqs = [base]
    for _ in range(haps - 1):
        s = base.copy()
        p = rng.integers(0, n, size=n // 150)
        s[p] = rng.integers(1, 5, size=p.size)
        # small indel content so run structure is irregular
        cut = int(rng.integers(10, n - 10))
        s = np.concatenate([s[:cut], rng.integers(1, 5, 4, dtype=np.int8),
                            s[cut:]])
        seqs.append(s)
    return seqs


@pytest.mark.parametrize("wide", [False, True])
def test_stream_build_equals_direct(tmp_path, wide):
    rng = np.random.default_rng(77)
    seqs = _pangenome(rng)
    names = [f"h{i}" for i in range(len(seqs))]
    direct = build_index([s.copy() for s in seqs], names=names,
                         already_encoded=True, force_wide=wide)
    prefix = str(tmp_path / ("w" if wide else "n"))
    build_index_streaming([s.copy() for s in seqs], names=names,
                          out_prefix=prefix, already_encoded=True,
                          force_wide=wide)
    got = MoniIndex.load(prefix)
    assert got.n == direct.n and got.r == direct.r
    assert got.sa0 == direct.sa0 and got.sa_last == direct.sa_last
    assert got.seq_names == direct.seq_names
    for f in dataclasses.fields(MoniIndex):
        a, b = getattr(direct, f.name), getattr(got, f.name)
        if not isinstance(a, np.ndarray):
            continue
        assert a.dtype == b.dtype, f.name
        assert np.array_equal(a, b), f.name


def test_stream_build_alignable(tmp_path):
    """The streamed index must serve the CPU engine end to end."""
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.index.alphabet import decode_seq, revcomp_codes
    rng = np.random.default_rng(5)
    seqs = _pangenome(rng)
    prefix = str(tmp_path / "s")
    build_index_streaming([s.copy() for s in seqs],
                          names=[f"h{i}" for i in range(len(seqs))],
                          out_prefix=prefix, already_encoded=True)
    idx = MoniIndex.load(prefix)
    reads = []
    for i in range(32):
        s = int(rng.integers(0, idx.n - 200))
        codes = idx.text[s:s + 120].copy()
        codes[rng.integers(0, 120, 2)] = rng.integers(1, 5, 2)
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append((f"r{i}", decode_seq(codes), "I" * 120))
    al = Aligner(idx, AlignConfig(engine="cpu", postseed_threads=2))
    recs = al.align_batch(reads)
    assert sum(1 for r in recs if not (r.flag & 4)) >= 30
