"""Reference-faithful single-end aligner (the oracle).

Transliterates the reference's SE hot path over monitpu's index:
find_mems (include/aligner/seed_finder.hpp:126-166), populate_seeds
with Phi-walk occurrence enumeration, per-genome n_seeds_thr filtering
and seed halving (seed_finder.hpp:169-329), seed_freq_filter
(aligner_ksw2.hpp:1905-1933), find_chains, the check_k/region-dedup
selection loop with check_left_MEM (aligner_ksw2.hpp:394-483, 553-597),
piecewise chain_score/fill_chain finalize (fill.py), BWA-style SE MAPQ
(mapq.hpp:146-184; the reference passes sub_n=0 on the SE path —
chain_score's default — despite computing al.sub_n), and SAM field
assembly including OA/AA/ZS.

This is BOTH the golden comparator for the TPU pipeline
(tests/test_parity_oracle.py) and the measured CPU baseline
(tools/cpu_baseline.py): a faithful reimplementation of the reference
algorithm in Python + native C++ DP kernels.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..index import refimpl
from ..index.alphabet import encode_seq, revcomp_codes, decode_seq
from ..align.mapq import compute_mapq_se_bwa
from ..align.sam import SamRecord, SAM_UNMAPPED, SAM_REVERSED
from .chainer import (Mem, ChainParams, find_chains, find_chains_secondary,
                      MATE_1, MATE_F, MATE_RC)
from .fill import FillParams, chain_score, cigar_rlen


@dataclasses.dataclass(frozen=True)
class OracleParams:
    """config_t defaults (aligner_ksw2.hpp:84-130)."""
    min_len: int = 25
    check_k: int = 5
    region_dist: int = 10
    filter_seeds: bool = True
    n_seeds_thr: int = 1000       # driver default -S 1000 (moni.in:766)
    filter_freq: bool = True
    freq_thr: float = 0.50
    left_mem_check: bool = True
    secondary_chains: bool = False
    filter_dir: bool = True       # PE orientation filter (config_t:94-95)
    dir_thr: float = 50.0
    find_orphan: bool = True
    fill: FillParams = FillParams()
    chain: ChainParams = ChainParams()


def cigar_string(ops) -> str:
    return "".join(f"{l}{op}" for op, l in ops) if ops else "*"


class OracleAligner:
    def __init__(self, index, params: OracleParams = OracleParams(),
                 liftidx=None):
        self.idx = index
        self.p = params
        self.liftidx = liftidx
        self.text = np.asarray(index.text, dtype=np.int8)
        self.n = int(index.n)
        self.seq_starts = np.asarray(index.seq_starts)
        self.seq_names = list(index.seq_names)
        self.stats = {"processed": 0, "aligned": 0}

    # ---- seqidx/liftidx surface (ctx protocol for fill_chain) ----
    def index(self, pos):
        """seqidx::index (seqidx.hpp:149-155): (name, offset)."""
        s = int(np.searchsorted(self.seq_starts, pos, side="right") - 1)
        s = max(0, min(s, len(self.seq_names) - 1))
        return self.seq_names[s], pos - int(self.seq_starts[s])

    def valid(self, pos, length) -> bool:
        """seqidx::valid (seqidx.hpp:164-167): [pos, pos+len) must not
        cross into the next sequence's region."""
        s = int(np.searchsorted(self.seq_starts, pos, side="right") - 1)
        s = max(0, min(s, len(self.seq_names) - 1))
        return pos + length <= int(self.seq_starts[s + 1])

    def lift(self, pos):
        return pos if self.liftidx is None else self.liftidx.lift(pos)

    def lift_cigar(self, pos, ops):
        if self.liftidx is None:
            return pos, [(o, l) for o, l in ops]
        return self.liftidx.lift_cigar(pos, ops)

    # ---- seed_finder ----
    def find_mems(self, codes, mems, r_offset=0, mate=0):
        """seed_finder::find_mems (seed_finder.hpp:126-166)."""
        ptr = refimpl.ms_pointers(self.idx, codes)
        m = len(codes)
        n = self.n
        text = self.text
        l = 0
        pl = 0
        n_ns = 0
        prev_pos_plus_one = n + 1
        for i in range(m):
            pos = int(ptr[i])
            while (pos != prev_pos_plus_one and i + l < m and pos + l < n
                   and codes[i + l] == text[pos + l]):
                n_ns = n_ns + 1 if codes[i + l] == 5 else 0
                l += 1
            if l >= pl and n_ns < l and l >= self.p.min_len:
                mems.append(Mem(pos=pos, len=l, idx=i, mate=mate,
                                rpos=r_offset + i + l - 1))
            pl = l
            l = l - 1 if l > 0 else 0
            prev_pos_plus_one = pos + 1

    def _populate_dict(self, pos, count_dict):
        name = self.index(pos)[0]
        count_dict[name] = count_dict.get(name, 0) + 1
        return count_dict[name]

    def _get_prev(self, curr):
        """get_prev_occ_with_lcp (seed_finder.hpp:359-370)."""
        if curr == self.idx.sa0:
            return self.idx.sa_last, 0
        return refimpl.phi(self.idx, curr)

    def _get_next(self, curr):
        if curr == self.idx.sa_last:
            return self.idx.sa0, 0
        return refimpl.phi_inv(self.idx, curr)

    def _find_mem_above(self, curr, length, mem):
        """find_MEM_above (seed_finder.hpp:169-203)."""
        prev, lcp = self._get_prev(curr)
        while lcp >= length:
            ref_count = self._populate_dict(prev, mem.count_dict)
            mem.occs.append(prev)
            mem.total_occ += 1
            if self.p.filter_seeds and ref_count > self.p.n_seeds_thr:
                mem.occs.pop()
                mem.num_filtered += 1
            prev, lcp = self._get_prev(prev)

    def _find_mem_below(self, curr, length, mem):
        nxt, lcp = self._get_next(curr)
        while lcp >= length:
            ref_count = self._populate_dict(nxt, mem.count_dict)
            mem.occs.append(nxt)
            mem.total_occ += 1
            if self.p.filter_seeds and ref_count > self.p.n_seeds_thr:
                mem.occs.pop()
                mem.num_filtered += 1
            nxt, lcp = self._get_next(nxt)

    def _find_mem_occs(self, mem):
        """find_MEM_occs (seed_finder.hpp:244-254)."""
        self._populate_dict(mem.pos, mem.count_dict)
        mem.occs.append(mem.pos)
        mem.total_occ += 1
        self._find_mem_above(mem.pos, mem.len, mem)
        self._find_mem_below(mem.pos, mem.len, mem)

    def populate_seeds(self, mems, report_mems=False):
        """populate_seeds + seed halving (seed_finder.hpp:257-318)."""
        n_mems = len(mems)
        for j in range(n_mems):
            mem = mems[j]
            l, i, mate, pos, r = mem.len, mem.idx, mem.mate, mem.pos, mem.rpos
            self._populate_dict(pos, mem.count_dict)
            mem.occs.append(pos)
            mem.total_occ += 1
            self._find_mem_above(pos, l, mem)
            upper_suffix = mem.occs[-1]
            self._find_mem_below(pos, l, mem)
            lower_suffix = mem.occs[-1]
            if l >= (self.p.min_len << 1) and not report_mems:
                ll = l >> 1
                m1 = Mem(pos=upper_suffix, len=ll, idx=i, mate=mate,
                         rpos=r - l + ll)
                mems.append(m1)
                self._populate_dict(m1.pos, m1.count_dict)
                m1.occs.append(upper_suffix)
                m1.total_occ += 1
                self._find_mem_above(upper_suffix, ll, m1)
                self._find_mem_below(lower_suffix, ll, m1)
                m2 = Mem(pos=pos + ll, len=l - ll, idx=i + ll, mate=mate,
                         rpos=r)
                mems.append(m2)
                self._find_mem_occs(m2)

    def seed_freq_filter(self, mems):
        """aligner_ksw2.hpp:1905-1933; returns #occurrences filtered."""
        total = sum(len(m.occs) for m in mems)
        if total == 0:
            return 0
        dropped = 0
        keep = []
        for m in mems:
            if len(m.occs) / total > self.p.freq_thr:
                dropped += len(m.occs)
            else:
                keep.append(m)
        mems[:] = keep
        return dropped

    # ---- SE alignment (aligner_ksw2.hpp:328-521) ----
    def align_se(self, name, seq, qual=None) -> SamRecord:
        self.stats["processed"] += 1
        fwd = encode_seq(seq)
        rc = revcomp_codes(fwd)
        rec = SamRecord(qname=name, seq=seq, qual=qual if qual else "*")

        mems = []
        self.find_mems(fwd, mems, 0, MATE_1 | MATE_F)
        self.find_mems(rc, mems, 0, MATE_1 | MATE_RC)
        self.populate_seeds(mems)
        if self.p.filter_freq:
            self.seed_freq_filter(mems)

        if self.p.secondary_chains:
            anchors, chains = find_chains_secondary(mems, self.p.chain)
        else:
            anchors, chains = find_chains(mems, self.p.chain)
        if not chains:
            rec.flag = SAM_UNMAPPED
            return rec

        min_score = int(20 + 8 * math.log(len(seq)))
        best_scores = []     # (score, lft, chain index)
        different_scores = set()
        left_mem_vec = []
        max_score = 0
        alt_haplotypes, alt_pos, alt_scores = [], [], []
        i = 0
        scored = {}          # chain idx -> score dict (reuse in finalize)
        while i < len(chains) and len(different_scores) < self.p.check_k:
            different_scores.add(chains[i].score)
            if self.p.left_mem_check and self._check_left_mem(
                    left_mem_vec, chains, anchors, mems, i):
                i += 1
                continue
            if len(different_scores) < self.p.check_k:
                chain = chains[i]
                fwd_anchors = list(reversed(chain.anchors))
                read = rc if (chain.mate & MATE_RC) else fwd
                score = chain_score(self, fwd_anchors, anchors, mems,
                                    min_score, read, self.p.fill,
                                    score_only=True)
                score["lft"] = self.lift(score["pos"])
                scored[i] = score
                # check_max_score (aligner_ksw2.hpp:525-548)
                if score["score"] > max_score:
                    max_score = score["score"]
                    alt_haplotypes, alt_pos, alt_scores = [], [], []
                elif score["score"] == max_score:
                    rn, off = self.index(score["pos"])
                    alt_haplotypes.append(rn)
                    alt_pos.append(off + 1)
                    alt_scores.append(score["score"])
                replaced = False
                j = 0
                while j < len(best_scores):
                    if abs(best_scores[j][1] - score["lft"]) < \
                            self.p.region_dist:
                        if score["score"] > best_scores[j][0]:
                            if replaced:
                                best_scores[j] = (0, 0, i - 1)
                            else:
                                best_scores[j] = (score["score"],
                                                  score["lft"], i)
                                i += 1
                                replaced = True
                        else:
                            j = len(best_scores)
                            replaced = True
                            i += 1
                    j += 1
                if not replaced:
                    best_scores.append((score["score"], score["lft"], i))
                    i += 1

        rec.alt_haplotypes = alt_haplotypes
        rec.alt_pos = alt_pos
        rec.alt_scores = alt_scores
        sub_n = len(best_scores) - 1
        del sub_n  # computed upstream (al.sub_n, :469) but never passed
        while len(best_scores) < 2:
            best_scores.append((0, 0, len(chains)))
        best_scores.sort(key=lambda t: (-t[0], -t[1], -t[2]))

        if best_scores[0][0] < min_score:
            rec.flag = SAM_UNMAPPED
            return rec

        score2 = best_scores[1][0]
        i = best_scores[0][2]
        chain = chains[i]
        fwd_anchors = list(reversed(chain.anchors))
        strand = 1 if (chain.mate & MATE_RC) else 0
        read = rc if strand else fwd
        fin = chain_score(self, fwd_anchors, anchors, mems, min_score,
                          read, self.p.fill, score_only=False)
        if fin["score"] < min_score:
            rec.flag = SAM_UNMAPPED
            return rec
        self.stats["aligned"] += 1

        rec.flag = SAM_REVERSED if strand else 0
        if strand:
            rec.seq = decode_seq(read)
            rec.qual = qual[::-1] if qual else "*"
        rec.zs = score2
        rec.asc = fin.get("as", fin["score"])
        # OA fields: haplotype-coordinate alignment (:3125-3131)
        lr_name, lr_off = self.index(fin["lift_pos"])
        rec.lift_rname = lr_name
        rec.lift_pos = lr_off + 1
        rec.lift_cigar = cigar_string(fin["lift_cigar"])
        rec.lift_md = fin["lift_md"]
        rec.lift_nm = fin["lift_nm"]
        rec.lift_rlen = fin["lift_rlen"]
        if fin.get("unmapped_lft"):
            rec.rname, rec.pos, rec.cigar, rec.rlen = "*", 0, "*", 0
            rec.unmapped_lft = True
        else:
            rn, off = self.index(fin["pos"])
            rec.rname = rn
            rec.pos = off + 1
            rec.cigar = cigar_string(fin["cigar"])
            rec.md = fin["md"]
            rec.nm = fin["nm"]
            rec.rlen = fin["rlen"]
        rec.mapq = compute_mapq_se_bwa(
            rec.asc, score2, rec.rlen, len(seq), self.p.min_len,
            self.p.fill.smatch, self.p.fill.smismatch)
        return rec

    def _check_left_mem(self, left_mem_vec, chains, anchors, mems, i):
        """check_left_MEM (aligner_ksw2.hpp:553-597)."""
        chain = chains[i]
        a0 = chain.anchors[-1]   # leftmost anchor (chain stored end-first)
        left_mem_pos = mems[anchors[a0][0]].occs[anchors[a0][1]]
        lift = self.lift(left_mem_pos)
        _, off = self.index(lift)
        left_mem_ref_pos = off + 1
        for pos_j, score_j in left_mem_vec:
            if abs(pos_j - left_mem_ref_pos) < self.p.region_dist:
                if score_j == chain.score:
                    return True
        left_mem_vec.append((left_mem_ref_pos, chain.score))
        return False
