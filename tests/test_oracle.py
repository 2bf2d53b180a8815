"""Oracle self-tests: the extz kernel against a naive affine DP, the
faithful chainer against a transparent reimplementation of its scoring
rule, fill_chain invariants (piecewise <= global realign, reference
:3038 assert), and end-to-end SE oracle behavior on a synthetic
pangenome (truth positions, the check_left_MEM same-offset dedup)."""

import math

import numpy as np
import pytest

from monitpu.index import build_index, decode_seq
from monitpu.index.alphabet import encode_seq, revcomp_codes
from monitpu.oracle import ksw2
from monitpu.oracle.chainer import (Mem, ChainParams, find_chains,
                                    find_chains_secondary, ilog2_32)
from monitpu.oracle.fill import FillParams, fill_chain, write_md_core
from monitpu.oracle.se import OracleAligner, OracleParams


def naive_global(q, t, sm=2, sx=4, go=4, ge=2):
    Q, T = len(q), len(t)
    NEG = -(10**9)
    H = np.full((Q + 1, T + 1), NEG, np.int64)
    E = np.full_like(H, NEG)
    F = np.full_like(H, NEG)
    H[0, 0] = 0
    for j in range(1, T + 1):
        H[0, j] = -(go + j * ge)
    for i in range(1, Q + 1):
        H[i, 0] = -(go + i * ge)

    def s(a, b):
        if a in (0, 5) or b in (0, 5):
            return 0
        return sm if a == b else -sx

    for i in range(1, Q + 1):
        for j in range(1, T + 1):
            E[i, j] = max(E[i, j - 1], H[i, j - 1] - go) - ge
            F[i, j] = max(F[i - 1, j], H[i - 1, j] - go) - ge
            H[i, j] = max(H[i - 1, j - 1] + s(q[i - 1], t[j - 1]),
                          E[i, j], F[i, j])
    return H


class TestExtzKernel:
    def test_vs_naive_dp(self):
        rng = np.random.default_rng(0)
        for _ in range(60):
            Q = int(rng.integers(1, 40))
            T = int(rng.integers(1, 60))
            q = rng.integers(1, 6, Q).astype(np.int8)  # incl. N codes
            t = rng.integers(1, 6, T).astype(np.int8)
            H = naive_global(list(q), list(t))
            out = ksw2.extz(q, t)
            assert out["score"] == H[Q, T]
            assert out["mqe"] == H[Q, 1:].max()
            assert out["mqe_t"] == int(np.argmax(H[Q, 1:]))

    def test_cigar_rescores_and_consumes(self):
        rng = np.random.default_rng(1)
        for _ in range(60):
            Q = int(rng.integers(1, 40))
            T = int(rng.integers(1, 60))
            q = rng.integers(1, 5, Q).astype(np.int8)
            t = rng.integers(1, 5, T).astype(np.int8)
            out = ksw2.extz(q, t)
            qi = ti = sc = 0
            for op, l in out["cigar"]:
                if op == "M":
                    for k in range(l):
                        sc += 2 if q[qi + k] == t[ti + k] else -4
                    qi += l
                    ti += l
                elif op == "I":
                    sc -= 4 + 2 * l
                    qi += l
                else:
                    sc -= 4 + 2 * l
                    ti += l
            assert (qi, ti) == (Q, T)
            assert sc == out["score"]

    def test_right_aligned_gaps(self):
        # deletion in a GG homopolymer lands on the rightmost base
        out = ksw2.extz(np.array([1, 2, 3, 4], np.int8),
                        np.array([1, 2, 3, 3, 4], np.int8))
        assert out["cigar"] == [("M", 3), ("D", 1), ("M", 1)]
        out = ksw2.extz(np.array([1, 1, 1, 1], np.int8),
                        np.array([1, 1, 1], np.int8))
        assert out["cigar"] == [("M", 3), ("I", 1)]

    def test_extz_only_traceback_ends_at_mqe(self):
        q = np.array([1, 2, 3, 4, 1, 2], np.int8)
        t = np.array([1, 2, 3, 4, 1, 2, 4, 4, 4, 4], np.int8)
        out = ksw2.extz(q, t, flags=ksw2.EXTZ_ONLY)
        assert out["mqe_t"] == 5
        tlen = sum(l for op, l in out["cigar"] if op in "MD")
        assert tlen == out["mqe_t"] + 1
        assert out["mqe"] == 12

    def test_sep_and_n_score_zero(self):
        # reference maps separators to N: matrix 0 (aligner_ksw2.hpp:3266)
        q = np.array([1, 2, 3], np.int8)
        t = np.array([1, 0, 3], np.int8)    # SEP in target
        out = ksw2.extz(q, t)
        assert out["score"] == 4            # 2 matches + 1 zero

    def test_batch_matches_single(self):
        rng = np.random.default_rng(2)
        qs = rng.integers(1, 5, (8, 20)).astype(np.int8)
        ts = rng.integers(1, 5, (8, 30)).astype(np.int8)
        qlens = rng.integers(5, 21, 8).astype(np.int32)
        tlens = rng.integers(5, 31, 8).astype(np.int32)
        flags = np.zeros(8, np.int32)
        out = ksw2.extz_batch(qs, qlens, ts, tlens, flags)
        for l in range(8):
            one = ksw2.extz(qs[l, :qlens[l]], ts[l, :tlens[l]])
            assert out["score"][l] == one["score"]
            assert out["mqe"][l] == one["mqe"]
            assert out["cigars"][l] == one["cigar"]


class TestChainer:
    def _mk(self, pos, length, idx, mate=0, occs=None):
        m = Mem(pos=pos, len=length, idx=idx, mate=mate,
                rpos=idx + length - 1)
        m.occs = occs if occs is not None else [pos]
        return m

    def test_ilog2(self):
        assert [ilog2_32(v) for v in [1, 2, 3, 4, 7, 8, 1023, 1024]] == \
            [0, 1, 1, 2, 2, 3, 9, 10]

    def test_collinear_anchors_chain(self):
        mems = [self._mk(100, 30, 0), self._mk(140, 30, 40),
                self._mk(180, 30, 80)]
        anchors, chains = find_chains(
            mems, ChainParams(min_chain_score=10))
        assert len(chains) >= 1
        top = chains[0]
        got = [anchors[a] for a in reversed(top.anchors)]
        assert [g[0] for g in got] == [0, 1, 2]
        # score: w_0 + 2 gap-free steps of alpha=min(40,40,30)=30, beta
        # ~ (0.01*0*avg + 0)>>1 = 0 since x_d == y_d
        assert top.score == 90

    def test_far_occurrences_make_separate_chains(self):
        mems = [self._mk(100, 50, 0, occs=[100, 5000])]
        _, chains = find_chains(mems, ChainParams(min_chain_score=10))
        assert len(chains) == 2
        assert all(len(c.anchors) == 1 for c in chains)

    def test_secondary_includes_both_copies(self):
        # two copies of a 2-anchor chain (w + alpha = 30 + 30 = 60 each);
        # the primary lane already yields both, the secondary lane adds
        # single-anchor chains that never reuse primary occ positions
        mems = [self._mk(100, 30, 0, occs=[100, 5100]),
                self._mk(140, 30, 40, occs=[140, 5140])]
        _, chains = find_chains_secondary(
            mems, ChainParams(min_chain_score=10))
        assert len(chains) >= 2
        assert chains[0].score == chains[1].score == 60
        prim = find_chains(mems, ChainParams(min_chain_score=10))[1]
        assert {c.score for c in prim} <= {c.score for c in chains}

    def test_mate_compat_mask(self):
        # same mate, read order inverted -> cannot chain (y_j >= y_i)
        mems = [self._mk(100, 30, 40), self._mk(140, 30, 0)]
        _, chains = find_chains(mems, ChainParams(min_chain_score=10))
        assert all(len(c.anchors) == 1 for c in chains)


def _ctx(idx):
    """Identity-lift fill ctx over a MoniIndex."""
    class Ctx:
        text = np.asarray(idx.text, np.int8)
        n = int(idx.n)

        def valid(self, pos, ln):
            s = int(np.searchsorted(np.asarray(idx.seq_starts), pos,
                                    side="right") - 1)
            return pos + ln <= int(idx.seq_starts[s + 1])

        def lift(self, pos):
            return pos

        def lift_cigar(self, pos, ops):
            return pos, [(o, l) for o, l in ops]
    return Ctx()


class TestFillChain:
    @pytest.fixture(scope="class")
    def small(self):
        rng = np.random.default_rng(11)
        seq = rng.integers(1, 5, 3000).astype(np.int8)
        idx = build_index([seq], names=["chr"], already_encoded=True)
        return idx, seq

    def test_exact_read_scores_full_match(self, small):
        idx, seq = small
        ctx = _ctx(idx)
        read = np.asarray(idx.text[500:580], np.int8)
        mems = [Mem(pos=500, len=80, idx=0, occs=[500], rpos=79)]
        out = fill_chain(ctx, mems, [(0, 0)], read[:0], read[80:], read,
                         score_only=False)
        assert out["score"] == 160
        assert out["lift_cigar"] == [("M", 80)]
        assert out["lift_md"] == "80"
        assert out["lift_nm"] == 0
        assert out["pos"] == 500

    def test_piecewise_not_above_global(self, small):
        """The reference asserts realign >= piecewise (:3038)."""
        idx, seq = small
        ctx = _ctx(idx)
        rng = np.random.default_rng(5)
        for _ in range(10):
            start = int(rng.integers(200, 2000))
            read = np.asarray(idx.text[start:start + 90], np.int8).copy()
            for _ in range(3):
                # only outside the anchor: a MEM is an exact match by
                # construction, the invariant presumes that
                p = int(rng.integers(35, 85))
                read[p] = ((read[p] + 1 - 1) % 4) + 1
            # single anchor on the (possibly broken) full window
            mems = [Mem(pos=start, len=30, idx=0, occs=[start], rpos=29)]
            piece = fill_chain(ctx, mems, [(0, 0)], read[:0], read[30:],
                               read, score_only=True)
            glob = fill_chain(ctx, mems, [(0, 0)], read[:0], read[30:],
                              read, score_only=True, realign=True)
            assert glob["score"] >= piece["score"]

    def test_gap_between_anchors_emits_insertion(self, small):
        idx, seq = small
        ctx = _ctx(idx)
        t = np.asarray(idx.text, np.int8)
        # read = [500:540) + 3 inserted bases + [540:580)
        ins = np.array([1, 2, 3], np.int8)
        read = np.concatenate([t[500:540], ins, t[540:580]])
        mems = [Mem(pos=500, len=40, idx=0, occs=[500], rpos=39),
                Mem(pos=540, len=40, idx=43, occs=[540], rpos=82)]
        out = fill_chain(ctx, mems, [(0, 0), (1, 0)], read[:0],
                         read[83:], read, score_only=False)
        # pure insertion closed form: -min(4+3*2, 13+3*1) = -10
        assert out["score"] == 40 * 2 * 2 - 10
        assert ("I", 3) in [tuple(x) for x in out["lift_cigar"]]

    def test_md_core_reference_semantics(self):
        # no trailing 0; deletion bases uppercase; N/SEP compare equal
        t = np.array([1, 2, 3, 4, 1], np.int8)
        q = np.array([1, 2, 2, 4, 1], np.int8)
        md, nm = write_md_core(t, q, [("M", 5)])
        assert (md, nm) == ("2G2", 1)
        md, nm = write_md_core(t, q[:4], [("M", 2), ("D", 1), ("M", 2)])
        assert md.startswith("2^G")
        t2 = np.array([0], np.int8)   # SEP renders as N, matches read N
        md, nm = write_md_core(t2, np.array([5], np.int8), [("M", 1)])
        assert (md, nm) == ("1", 0)


class TestOracleSE:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(7)
        base = rng.integers(1, 5, size=4000, dtype=np.int8)
        seqs = []
        for _ in range(3):
            s = base.copy()
            k = s.size // 50
            p = rng.integers(0, s.size, size=k)
            s[p] = rng.integers(1, 5, size=k)
            seqs.append(s)
        idx = build_index(seqs, names=["hap1", "hap2", "hap3"],
                          already_encoded=True)
        oa = OracleAligner(idx, OracleParams(
            min_len=15, chain=ChainParams(min_chain_score=12)))
        return seqs, oa

    def test_reads_map_to_truth_offset(self, setup):
        seqs, oa = setup
        rng = np.random.default_rng(3)
        ok = 0
        for i in range(20):
            hap = int(rng.integers(0, 3))
            L = 80
            start = int(rng.integers(0, len(seqs[hap]) - L))
            codes = seqs[hap][start:start + L].copy()
            for _ in range(2):
                p = int(rng.integers(5, L - 5))
                codes[p] = ((codes[p] + int(rng.integers(1, 4)) - 1) % 4) + 1
            revd = bool(rng.integers(0, 2))
            s = decode_seq(revcomp_codes(codes.astype(np.int8))
                           if revd else codes)
            rec = oa.align_se(f"r{i}", s, "I" * L)
            assert not (rec.flag & 4), f"read {i} unmapped"
            assert bool(rec.flag & 16) == revd
            # check_left_MEM dedups same-offset cross-haplotype hits:
            # the offset must match truth even if the name differs
            assert abs(rec.pos - (start + 1)) <= 2
            ok += rec.rname == f"hap{hap + 1}"
        assert ok >= 10   # name ties may resolve to another haplotype

    def test_as_consistent_with_cigar_md(self, setup):
        seqs, oa = setup
        rng = np.random.default_rng(9)
        for i in range(10):
            hap, L = int(rng.integers(0, 3)), 70
            start = int(rng.integers(0, len(seqs[hap]) - L))
            s = decode_seq(seqs[hap][start:start + L])
            rec = oa.align_se(f"r{i}", s)
            assert rec.cigar == "70M"
            assert rec.asc == 140
            assert rec.mapq <= 60

    def test_deletion_read_gets_deletion_cigar(self, setup):
        seqs, oa = setup
        t = seqs[0]
        read = np.concatenate([t[1000:1040], t[1048:1088]])
        rec = oa.align_se("del", decode_seq(read))
        assert not (rec.flag & 4)
        assert "D" in rec.cigar
        assert rec.pos == 1001
