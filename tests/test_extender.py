"""Legacy extender (extender_ksw2.hpp semantics): reads sampled from the
text must extend to their true position with the right strand; junk
reads must not emit records."""

import numpy as np

from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.extender import Extender, compute_mapq_extender
from monitpu.align.sam import SAM_UNMAPPED, SAM_REVERSED
from monitpu.index.alphabet import decode_seq, revcomp_codes
from monitpu.ops.chain import ChainConfig

from test_ms_kernel import build_small


def make_extender(rng, n=1200):
    idx_seqs = []
    base = rng.integers(1, 5, size=n // 3, dtype=np.int8)
    for _ in range(3):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 15)
        s[p] = rng.integers(1, 5, size=p.size)
        idx_seqs.append(s)
    from monitpu.index import build_index
    idx = build_index(idx_seqs, already_encoded=True)
    cfg = AlignConfig(min_len=15, max_mems=8, max_occs=8, max_anchors=64,
                      read_pad=96, window=224, margin=24,
                      chain=ChainConfig(min_chain_score=12, max_chains=4,
                                        max_chain_len=16))
    return idx, Extender(Aligner(idx, cfg))


def test_extend_exact_and_mutated(rng):
    idx, ext = make_extender(rng)
    t = idx.text
    reads = []
    truth = []
    for i in range(10):
        s = int(rng.integers(0, idx.n - 90))
        codes = t[s:s + 80].astype(np.int64).copy()
        if np.any(codes == 0):
            codes[codes == 0] = 1
        codes[40] = (codes[40] % 4) + 1  # one mismatch mid-read
        rc = i % 2 == 1
        if rc:
            codes = revcomp_codes(codes.astype(np.int8))
        reads.append((f"r{i}", decode_seq(codes), "I" * 80))
        truth.append((s, rc))
    recs = ext.extend_batch(reads)
    by_name = {}
    for r in recs:
        by_name.setdefault(r.qname, []).append(r)
    ok = 0
    for i, (s, rc) in enumerate(truth):
        rs = by_name[f"r{i}"]
        mapped = [r for r in rs if not (r.flag & SAM_UNMAPPED)]
        if not mapped:
            continue
        r = mapped[0]
        name, off = ext.al.pos_to_ref(s)
        assert r.rname == name
        assert abs(r.pos - 1 - off) <= 3
        assert bool(r.flag & SAM_REVERSED) == rc
        ok += 1
    assert ok >= 8  # near-exact reads must extend


def test_extend_junk_reads_unmapped(rng):
    idx, ext = make_extender(rng)
    reads = [(f"j{i}", decode_seq(rng.integers(1, 5, size=80).astype(np.int8)),
              "I" * 80) for i in range(6)]
    recs = ext.extend_batch(reads)
    assert all(r.flag & SAM_UNMAPPED for r in recs)
    assert ext.stats["extended"] == 0


def test_mapq_extender_bins():
    # perfect score, no second best
    assert compute_mapq_extender(160, 0, 55, 80, 2) == 44
    # weak score near the gate -> low mapq
    assert compute_mapq_extender(60, 0, 55, 80, 2) <= 4
    # second-best present caps quality
    assert compute_mapq_extender(160, 120, 55, 80, 2) < 44
