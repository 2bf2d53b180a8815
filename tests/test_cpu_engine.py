"""CPU seed engine parity: the native CPU seed stage must produce
byte-identical SAM to the TPU seed stage (both feed the same post-seed
runtime), making bench.py's reads/s comparison apples-to-apples."""

import numpy as np
import pytest

from monitpu.index import build_index, decode_seq
from monitpu.index.alphabet import revcomp_codes
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.cpu import CpuAligner
from monitpu.align.paired import PairedAligner

FIELDS = ["flag", "rname", "pos", "cigar", "asc", "md", "nm", "mapq",
          "zs", "lift_pos", "lift_cigar"]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    base = rng.integers(1, 5, size=50_000, dtype=np.int8)
    seqs = []
    for h in range(3):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 120)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, names=[f"h{i}" for i in range(3)],
                      already_encoded=True)
    return idx, seqs, rng


def test_cpu_engine_se_parity(setup):
    idx, seqs, rng = setup
    L = 130
    reads = []
    for i in range(60):
        hap = int(rng.integers(0, 3))
        start = int(rng.integers(0, len(seqs[hap]) - L - 20))
        codes = seqs[hap][start:start + L].copy()
        for _ in range(2):
            p = int(rng.integers(5, L - 5))
            codes[p] = ((codes[p] + 1 - 1) % 4) + 1
        if i % 2:
            codes = revcomp_codes(codes.astype(np.int8))
        reads.append((f"r{i}", decode_seq(codes), "I" * L))
    cfg = AlignConfig(max_occs=32, postseed_threads=2)
    tpu = Aligner(idx, cfg).align_batch(reads)
    cpu = CpuAligner(idx, cfg).align_batch(reads)
    diffs = [(t.qname, f, getattr(t, f), getattr(c, f))
             for t, c in zip(tpu, cpu) for f in FIELDS
             if getattr(t, f) != getattr(c, f)]
    assert not diffs, diffs[:10]
    # the engine="cpu" Aligner route must match too
    cpu2 = Aligner(idx, AlignConfig(max_occs=32, postseed_threads=2,
                                    engine="cpu")).align_batch(reads)
    diffs = [(t.qname, f) for t, c in zip(tpu, cpu2) for f in FIELDS
             if getattr(t, f) != getattr(c, f)]
    assert not diffs, diffs[:10]


def test_cpu_engine_pe_parity(setup):
    idx, seqs, rng = setup
    L = 100

    def pairs(n):
        b1, b2 = [], []
        for i in range(n):
            hap = int(rng.integers(0, 3))
            ins = int(rng.integers(250, 340))
            s = int(rng.integers(0, len(seqs[hap]) - ins - 40))
            frag = seqs[hap][s:s + ins]
            m1 = frag[:L].copy()
            m2 = revcomp_codes(frag[-L:].copy())
            b1.append((f"p{i}/1", decode_seq(m1), "I" * L))
            b2.append((f"p{i}/2", decode_seq(m2), "I" * L))
        return b1, b2

    tpu = PairedAligner(Aligner(idx, AlignConfig(max_occs=32,
                                                 postseed_threads=2)))
    cpu = PairedAligner(Aligner(idx, AlignConfig(max_occs=32,
                                                 postseed_threads=2,
                                                 engine="cpu")))
    tb1, tb2 = pairs(30)
    tpu.learn_pair_batch(tb1, tb2)
    cpu.learn_pair_batch(tb1, tb2)
    assert tpu.ins.count == cpu.ins.count
    assert tpu.ins.mean == cpu.ins.mean
    b1, b2 = pairs(20)
    rt = tpu.align_pair_batch(b1, b2)
    rc = cpu.align_pair_batch(b1, b2)
    diffs = [(t.qname, f) for t, c in zip(rt, rc)
             for f in FIELDS + ["pnext", "tlen"]
             if getattr(t, f) != getattr(c, f)]
    assert not diffs, diffs[:10]
