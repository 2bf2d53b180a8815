"""End-to-end paired-end alignment on a synthetic pangenome."""

import numpy as np
import pytest

from monitpu.index import build_index, decode_seq, revcomp_codes
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.paired import PairedAligner, InsertModel
from monitpu.ops.chain import ChainConfig
from monitpu.align.sam import (SAM_UNMAPPED, SAM_PAIRED, SAM_MAPPED_PAIRED,
                               SAM_REVERSED, SAM_FIRST_IN_PAIR,
                               SAM_SECOND_IN_PAIR)

# behavioral PE checks on the production native path (field-level
# reference parity lives in test_parity_pe.py)
CFG = AlignConfig(
    min_len=15,
    max_mems=6, max_occs=8, max_anchors=96,
    read_pad=64, window=160, margin=24,
    chain=ChainConfig(min_chain_score=12, max_chains=4, max_chain_len=16),
)


@pytest.fixture(scope="module")
def pe_setup():
    rng = np.random.default_rng(17)
    base = rng.integers(1, 5, size=3000, dtype=np.int8)
    seqs = []
    for _ in range(2):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 60)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, names=["hapA", "hapB"], already_encoded=True)
    return seqs, PairedAligner(Aligner(idx, CFG))


def sample_pair(rng, seqs, L=50, insert=160, jitter=15):
    hap = int(rng.integers(0, len(seqs)))
    tlen = insert + int(rng.integers(-jitter, jitter + 1))
    start = int(rng.integers(0, len(seqs[hap]) - tlen - 1))
    frag = seqs[hap][start:start + tlen]
    m1 = frag[:L].astype(np.int8)
    m2 = revcomp_codes(frag[-L:].astype(np.int8))
    return (decode_seq(m1), decode_seq(m2), hap, start, start + tlen - L)


def test_pe_basic(pe_setup):
    seqs, pal = pe_setup
    rng = np.random.default_rng(5)
    b1, b2, truth = [], [], []
    for i in range(16):
        s1, s2, hap, p1, p2 = sample_pair(rng, seqs)
        b1.append((f"p{i}/1", s1, "I" * len(s1)))
        b2.append((f"p{i}/2", s2, "I" * len(s2)))
        truth.append((hap, p1, p2))
    recs = pal.align_pair_batch(b1, b2)
    assert len(recs) == 32
    ok = 0
    for i, (hap, p1, p2) in enumerate(truth):
        r1, r2 = recs[2 * i], recs[2 * i + 1]
        assert r1.qname == r2.qname == f"p{i}"
        if r1.flag & SAM_UNMAPPED or r2.flag & SAM_UNMAPPED:
            continue
        assert r1.flag & SAM_PAIRED and r1.flag & SAM_FIRST_IN_PAIR
        assert r2.flag & SAM_SECOND_IN_PAIR
        # FR orientation: m1 forward, m2 reversed (direction 1)
        if abs(r1.pos - 1 - p1) <= 3 and abs(r2.pos - 1 - p2) <= 3:
            ok += 1
            assert r2.flag & SAM_REVERSED
            assert not (r1.flag & SAM_REVERSED)
            # TLEN symmetric
            assert r1.tlen == -r2.tlen and r1.tlen != 0
            assert r1.pnext == r2.pos and r2.pnext == r1.pos
            assert r1.rnext == "="
    assert ok >= 12, f"only {ok}/16 pairs proper"


def test_pe_insert_learning(pe_setup):
    seqs, pal = pe_setup
    rng = np.random.default_rng(9)
    pal.ins = InsertModel(learning_n=30)
    for _ in range(3):
        b1, b2 = [], []
        for i in range(16):
            s1, s2, *_ = sample_pair(rng, seqs)
            b1.append((f"x{i}/1", s1, None))
            b2.append((f"x{i}/2", s2, None))
        pal.learn_pair_batch(b1, b2)
    assert pal.ins.count >= 20
    # true insert-size distance distribution: dist = |p2 - (p1 + L)|
    # = tlen - 2L in [160-15-100, 160+15-100] = [45, 75]
    assert 30 <= pal.ins.mean <= 90, pal.ins.mean
    assert pal.ins.std_dev < 30


def test_pe_orphan_recovery(pe_setup):
    seqs, pal = pe_setup
    rng = np.random.default_rng(13)
    pal.ins = InsertModel(learning_n=1)
    pal.ins.add_batch([60.0, 70.0, 50.0, 65.0])
    assert pal.ins.std_dev > 0
    # mate2 heavily mutated in its seed region -> should orphan-recover
    b1, b2 = [], []
    for i in range(4):
        s1, s2, hap, p1, p2 = sample_pair(rng, seqs)
        s2l = list(s2)
        for j in range(0, len(s2l), 7):  # destroy MEMs
            s2l[j] = "ACGT"[(("ACGT".index(s2l[j])) + 1) % 4]
        b1.append((f"o{i}/1", s1, None))
        b2.append((f"o{i}/2", "".join(s2l), None))
    before = pal.stats["orphan_recovered"]
    recs = pal.align_pair_batch(b1, b2)
    # at least verify no crash and mate1s aligned
    n_m1 = sum(1 for i in range(4)
               if not (recs[2 * i].flag & SAM_UNMAPPED))
    assert n_m1 >= 2
