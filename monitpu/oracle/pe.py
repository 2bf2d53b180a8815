"""Reference-faithful paired-end aligner (the oracle).

Transliterates the reference's PE path over monitpu's index:
  * 4-lane MEM finding with rpos offsets + the direction filter incl.
    its stats quirk (aligner_ksw2.hpp:1006-1102: the dir2 average is
    computed AFTER populate_seeds so it sums the appended half-seeds
    of both directions while dividing by the dir2 parent count; the
    dir1-wins erase drops all halves, the dir2-wins erase keeps them)
  * paired chaining (mate-compat mask), get_best_scores with
    check_paired_left_MEM and the (m1,m2) region dedup (:1329-1431,
    1471-1533)
  * paired_chain_score: per-mate piecewise chain_score + the insert-
    size Gaussian term (:2115-2308), strand/flag/TLEN state machine,
    GATK unmapped-mate convention
  * PE MAPQ with real score2 / score2_m1 / score2_m2 / sub_n inputs
    (mapq.hpp:186-223; score_un is literally 0 upstream, :2237)
  * insert model learning gate (:816-885) and orphan recovery:
    klib-local search window then extz global (:1536-1658, 2330-2460,
    fill_orphan :2566-2711)

Documented divergences: std::sort on best_scores is unstable upstream
(ties by (tot, m1.lft, m2.lft) only) — we sort stably; klib ksw_align
endpoint tie-breaking is reproduced as first-max in scan order;
check_paired_left_MEM reads uninitialized memory upstream when a chain
has no anchor of one mate — we use position 0 for the missing mate.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..index.alphabet import encode_seq, revcomp_codes, decode_seq
from ..align.mapq import compute_mapq_se_bwa, compute_mapq_pe_bwa
from ..align.sam import (SamRecord, SAM_PAIRED, SAM_MAPPED_PAIRED,
                         SAM_UNMAPPED, SAM_MATE_UNMAPPED, SAM_REVERSED,
                         SAM_MATE_REVERSED, SAM_FIRST_IN_PAIR,
                         SAM_SECOND_IN_PAIR)
from .chainer import find_chains, find_chains_secondary
from .fill import chain_score, write_md_core, cigar_rlen
from .se import OracleAligner, OracleParams, cigar_string

MATE_1, MATE_2, MATE_F, MATE_RC = 0, 1, 0, 2


def local_align(seq, ref, smatch, smismatch, gapo, gape):
    """klib ksw_align-style local Smith-Waterman: returns (score, qe,
    te) of the best cell (first max in row-major scan) and (qb, tb)
    from the symmetric reverse pass (aligner_ksw2.hpp:2596-2600 usage).
    N (code 5) and SEP (0) score 0 vs everything (nt4 matrix)."""
    def fwd(q, t):
        Q, T = len(q), len(t)
        best, bi, bj = 0, -1, -1
        H = np.zeros(T + 1, np.int32)
        E = np.zeros(T + 1, np.int32)
        qn = (q == 0) | (q == 5)
        tn = (np.asarray(t) == 0) | (np.asarray(t) == 5)
        for i in range(Q):
            row = np.where(qn[i] | tn, 0,
                           np.where(t == q[i], smatch, -smismatch))
            Hd = H.copy()
            F = 0
            newH = np.zeros(T + 1, np.int32)
            for j in range(1, T + 1):
                e = max(E[j] - gape, Hd[j] - gapo - gape)
                F = max(F - gape, newH[j - 1] - gapo - gape)
                h = max(0, Hd[j - 1] + int(row[j - 1]), e, F)
                E[j] = e
                newH[j] = h
                if h > best:
                    best, bi, bj = h, i, j - 1
            H = newH
        return best, bi, bj
    q = np.asarray(seq, np.int8)
    t = np.asarray(ref, np.int8)
    score, qe, te = fwd(q, t)
    if score <= 0:
        return 0, 0, 0, 0, 0
    s2, ri, rj = fwd(q[:qe + 1][::-1], t[:te + 1][::-1])
    qb, tb = qe - ri, te - rj
    return score, qb, qe, tb, te


@dataclasses.dataclass
class InsertState:
    """Welford accumulator (aligner_ksw2.hpp:816-885)."""
    count: int = 0
    mean: float = 0.0
    m2: float = 0.0
    complete: bool = False
    learning_n: int = 1000
    score_gap_threshold: int = 0

    @property
    def std_dev(self):
        return math.sqrt(self.m2 / self.count) if self.count > 1 else 0.0

    def merge(self, count, mean, m2):
        if self.complete or count == 0:
            return
        if self.count > 0:
            t = self.count + count
            delta = self.mean - mean
            self.m2 += m2 + (delta * delta * self.count * count) / t
            self.mean = (self.count * self.mean + count * mean) / t
            self.count = t
        else:
            self.count, self.mean, self.m2 = count, mean, m2
        self.complete = self.count >= self.learning_n


class PEAlignment:
    """paired_alignment_t equivalent: the per-pair mutable state."""

    def __init__(self, name, seq1, q1, seq2, q2):
        self.m1f = encode_seq(seq1)
        self.m2f = encode_seq(seq2)
        self.m1r = revcomp_codes(self.m1f)
        self.m2r = revcomp_codes(self.m2f)
        self.len1, self.len2 = len(self.m1f), len(self.m2f)
        self.min_score_m1 = int(20 + 8 * math.log(self.len1))
        self.min_score_m2 = int(20 + 8 * math.log(self.len2))
        self.min_score = self.min_score_m1 + self.min_score_m2
        self.sam_m1 = SamRecord(qname=name, seq=seq1, qual=q1 or "*",
                                rnext="=")
        self.sam_m2 = SamRecord(qname=name, seq=seq2, qual=q2 or "*",
                                rnext="=")
        self.q1, self.q2 = q1, q2
        self.mems = []
        self.anchors = []
        self.chains = []
        self.best_scores = []
        self.score2 = 0
        self.score2_m1 = 0
        self.score2_m2 = 0
        self.sub_n = 0
        self.second_best_score = False
        self.aligned = False
        self.chained = False
        self.mean = 0.0
        self.std_dev = 0.0

    def mate_reads(self, strand):
        """(mate1, mate2) strand-applied code arrays."""
        if strand == 0:
            return self.m1f, self.m2r
        return self.m1r, self.m2f


def _zero_score():
    return {"score": 0, "pos": 0, "lft": 0, "unmapped_lft": False}


class OraclePairedAligner:
    def __init__(self, index, params: OracleParams = OracleParams(),
                 liftidx=None):
        self.se = OracleAligner(index, params, liftidx)
        self.p = params
        p = params.fill
        self.max_penalty = max(p.smatch + p.smismatch, p.gapo + p.gape)
        self.ins = InsertState()
        self.stats = {"pairs": 0, "paired_aligned": 0, "orphan": 0,
                      "orphan_recovered": 0}

    # ---- seeding + direction filter (aligner_ksw2.hpp:1006-1102) ----
    def _find_and_filter(self, al: PEAlignment):
        p = self.p
        se = self.se
        if p.filter_dir:
            se.find_mems(al.m1f, al.mems, 0, MATE_1 | MATE_F)
            se.find_mems(al.m2r, al.mems, al.len1, MATE_2 | MATE_RC)
            n_dir1 = len(al.mems)
            se.find_mems(al.m2f, al.mems, 0, MATE_2 | MATE_F)
            se.find_mems(al.m1r, al.mems, al.len2, MATE_1 | MATE_RC)
            n_dir2 = len(al.mems) - n_dir1
            se.populate_seeds(al.mems)

            avg1 = avg2 = 0.0
            for m in al.mems[:n_dir1]:
                avg1 += m.len
            if n_dir1 > 0:
                avg1 /= n_dir1
            # reference quirk: iterates to the grown (post-halves) end
            for m in al.mems[n_dir1:]:
                avg2 += m.len
            if n_dir2 > 0:
                avg2 /= n_dir2
            if avg1 > avg2 and (avg1 - avg2) > p.dir_thr:
                del al.mems[n_dir1:]
            if avg2 > avg1 and (avg2 - avg1) > p.dir_thr:
                del al.mems[:n_dir1]
            if p.filter_freq:
                se.seed_freq_filter(al.mems)
        else:
            se.find_mems(al.m1f, al.mems, 0, MATE_1 | MATE_F)
            se.find_mems(al.m1r, al.mems, al.len2, MATE_1 | MATE_RC)
            se.find_mems(al.m2f, al.mems, 0, MATE_2 | MATE_F)
            se.find_mems(al.m2r, al.mems, al.len1, MATE_2 | MATE_RC)
            se.populate_seeds(al.mems)
            if p.filter_freq:
                se.seed_freq_filter(al.mems)

    # ---- paired_chain_score (aligner_ksw2.hpp:2115-2308) ----
    def _strand_of(self, chain):
        m = chain.mate
        if m == 0 or ((m & MATE_RC) and (m & 1)):
            return 0
        return 1

    def _ins_tot(self, s1, s2, d, al):
        ns = 0.0
        if al.std_dev > 0.0:
            ns = (d - al.mean) / al.std_dev
        tot = int(s1 + s2 + .721 * math.log(2. * math.erfc(abs(ns) *
                  (2 ** -0.5))) * self.p.fill.smatch + .499)
        return max(tot, 0)

    def _split_mates(self, al, chain):
        m1_ids, m2_ids = [], []
        for a in reversed(chain.anchors):  # forward order
            if (al.mems[al.anchors[a][0]].mate & 1) == 0:
                m1_ids.append(a)
            else:
                m2_ids.append(a)
        return m1_ids, m2_ids

    def paired_chain_score(self, al: PEAlignment, chain_i, score_only=True):
        chain = al.chains[chain_i]
        strand = self._strand_of(chain)
        mate1, mate2 = al.mate_reads(strand)
        score = {"tot": 0, "dist": 0, "m1": _zero_score(),
                 "m2": _zero_score(), "chain_i": chain_i,
                 "paired": chain.paired, "fin1": None, "fin2": None,
                 "strand": strand}
        if not chain.paired:
            return score
        m1_ids, m2_ids = self._split_mates(al, chain)
        s1 = chain_score(self.se, m1_ids, al.anchors, al.mems,
                         al.min_score_m1, mate1, self.p.fill,
                         score_only=score_only)
        s2 = chain_score(self.se, m2_ids, al.anchors, al.mems,
                         al.min_score_m2, mate2, self.p.fill,
                         score_only=score_only)
        score["m1"] = {"score": s1["score"], "pos": s1["pos"],
                       "lft": self.se.lift(s1["pos"]),
                       "unmapped_lft": s1.get("unmapped_lft", False)}
        score["m2"] = {"score": s2["score"], "pos": s2["pos"],
                       "lft": self.se.lift(s2["pos"]),
                       "unmapped_lft": s2.get("unmapped_lft", False)}
        score["dist"] = abs(s2["pos"] - (s1["pos"] + al.len1))
        score["tot"] = self._ins_tot(s1["score"], s2["score"],
                                     score["dist"], al)
        score["fin1"], score["fin2"] = s1, s2
        return score

    # ---- get_best_scores (aligner_ksw2.hpp:1329-1431) ----
    def _check_paired_left_mem(self, v1, v2, al, i):
        chain = al.chains[i]
        p1 = p2 = None
        for a in reversed(chain.anchors):
            mem = al.mems[al.anchors[a][0]]
            pos = mem.occs[al.anchors[a][1]]
            if (mem.mate & 1) == 0 and p1 is None:
                _, off = self.se.index(self.se.lift(pos))
                p1 = off + 1
            elif (mem.mate & 1) and p2 is None:
                _, off = self.se.index(self.se.lift(pos))
                p2 = off + 1
            if p1 is not None and p2 is not None:
                break
        p1 = 0 if p1 is None else p1
        p2 = 0 if p2 is None else p2
        for (q1, s), (q2, _) in zip(v1, v2):
            if (abs(q1 - p1) < self.p.region_dist
                    and abs(q2 - p2) < self.p.region_dist
                    and s == chain.score):
                return True
        v1.append((p1, chain.score))
        v2.append((p2, chain.score))
        return False

    def get_best_scores(self, al: PEAlignment, k):
        different_scores = []
        v1, v2 = [], []
        max1 = max2 = 0
        alt1, alt2 = ([], [], []), ([], [], [])
        i = 0

        def check_max(maxs, sc, alt):
            if sc["score"] > maxs:
                alt[0].clear(); alt[1].clear(); alt[2].clear()
                return sc["score"]
            if sc["score"] == maxs:
                rn, off = self.se.index(sc["pos"])
                alt[0].append(rn)
                alt[1].append(off + 1)
                alt[2].append(sc["score"])
            return maxs

        while i < len(al.chains) and len(different_scores) < k:
            if al.chains[i].score not in different_scores:
                different_scores.append(al.chains[i].score)
            if self.p.left_mem_check and self._check_paired_left_mem(
                    v1, v2, al, i):
                i += 1
                continue
            if len(different_scores) < k:
                score = self.paired_chain_score(al, i)
                max1 = check_max(max1, score["m1"], alt1)
                max2 = check_max(max2, score["m2"], alt2)
                if score["tot"] >= al.min_score:
                    replaced = False
                    j = 0
                    while j < len(al.best_scores):
                        b = al.best_scores[j]
                        if (abs(b["m1"]["lft"] - score["m1"]["lft"])
                                < self.p.region_dist and
                                abs(b["m2"]["lft"] - score["m2"]["lft"])
                                < self.p.region_dist):
                            if score["tot"] > b["tot"]:
                                if replaced:
                                    z = {"tot": 0, "dist": 0,
                                         "m1": _zero_score(),
                                         "m2": _zero_score(),
                                         "chain_i": i, "paired": False}
                                    al.best_scores[j] = z
                                else:
                                    al.best_scores[j] = score
                                    replaced = True
                            else:
                                j = len(al.best_scores)
                                replaced = True
                        j += 1
                    if not replaced:
                        al.best_scores.append(score)
                i += 1

        al.sam_m1.alt_haplotypes, al.sam_m1.alt_pos, al.sam_m1.alt_scores = \
            list(alt1[0]), list(alt1[1]), list(alt1[2])
        al.sam_m2.alt_haplotypes, al.sam_m2.alt_pos, al.sam_m2.alt_scores = \
            list(alt2[0]), list(alt2[1]), list(alt2[2])

        while len(al.best_scores) < 2:
            al.best_scores.append({"tot": 0, "dist": 0,
                                   "m1": _zero_score(),
                                   "m2": _zero_score(),
                                   "chain_i": len(al.chains),
                                   "paired": False})
        al.best_scores.sort(
            key=lambda s: (-s["tot"], -s["m1"]["lft"], -s["m2"]["lft"]))
        j = 1
        al.sub_n = 0
        while (j < len(al.best_scores) and al.best_scores[j]["tot"]
               >= al.best_scores[0]["tot"] - self.max_penalty):
            al.sub_n += 1
            j += 1
        al.score2 = al.best_scores[1]["tot"]
        al.score2_m1 = al.best_scores[1]["m1"]["score"]
        al.score2_m2 = al.best_scores[1]["m2"]["score"]
        al.second_best_score = al.score2 >= al.min_score

    # ---- finalize SAM (the paired_chain_score(!score_only) arm) ----
    def _emit_mate(self, rec, fin):
        """Copy the chain_score finalize fields into the record (the
        fill_chain SAM-filling arm; see oracle/se.py)."""
        if not fin.get("finalized"):
            return
        lr_name, lr_off = self.se.index(fin["lift_pos"])
        rec.lift_rname = lr_name
        rec.lift_pos = lr_off + 1
        rec.lift_cigar = cigar_string(fin["lift_cigar"])
        rec.lift_md = fin["lift_md"]
        rec.lift_nm = fin["lift_nm"]
        rec.lift_rlen = fin["lift_rlen"]
        rec.asc = fin.get("as", fin["score"])
        if fin.get("unmapped_lft"):
            rec.rname, rec.pos, rec.cigar, rec.rlen = "*", 0, "*", 0
            rec.unmapped_lft = True
        else:
            rn, off = self.se.index(fin["pos"])
            rec.rname = rn
            rec.pos = off + 1
            rec.cigar = cigar_string(fin["cigar"])
            rec.md = fin["md"]
            rec.nm = fin["nm"]
            rec.rlen = fin["rlen"]

    def _finalize_pair(self, al: PEAlignment, score, orphan=False):
        """The !score_only tail shared by paired_chain_score and
        paired_chain_orphan_score (:2206-2288, 2470-2555)."""
        p = self.p
        strand = score["strand"]
        s1, s2 = score["m1"], score["m2"]
        sam1, sam2 = al.sam_m1, al.sam_m2
        fin1, fin2 = score["fin1"], score["fin2"]
        # sam->read = strand-applied mate (:2203-2204, set regardless of
        # which arms map): SEQ/QUAL follow the winning chain direction
        if strand == 1:
            sam1.seq = decode_seq(al.m1r)
            sam1.qual = al.q1[::-1] if al.q1 else "*"
        else:
            sam2.seq = decode_seq(al.m2r)
            sam2.qual = al.q2[::-1] if al.q2 else "*"
        if fin1:
            self._emit_mate(sam1, fin1)
            if fin1.get("finalized"):
                sam1.zs = al.score2_m1
                sam1.mapq = compute_mapq_se_bwa(
                    sam1.asc, al.score2_m1, sam1.rlen, al.len1, p.min_len,
                    p.fill.smatch, p.fill.smismatch, sub_n=al.sub_n)
        if fin2:
            self._emit_mate(sam2, fin2)
            if fin2.get("finalized"):
                sam2.zs = al.score2_m2
                sam2.mapq = compute_mapq_se_bwa(
                    sam2.asc, al.score2_m2, sam2.rlen, al.len2, p.min_len,
                    p.fill.smatch, p.fill.smismatch, sub_n=al.sub_n)

        ok1 = s1["score"] >= al.min_score_m1 and not s1["unmapped_lft"]
        ok2 = s2["score"] >= al.min_score_m2 and not s2["unmapped_lft"]
        if ok1 and ok2:
            sam1.pnext = sam2.pos
            sam2.pnext = sam1.pos
            if sam2.pos > sam1.pos:
                tlen = (sam2.pos + al.len2) - sam1.pos
                sam1.tlen, sam2.tlen = tlen, -tlen
            else:
                tlen = (sam1.pos + al.len1) - sam2.pos
                sam1.tlen, sam2.tlen = -tlen, tlen
            _, m1q, m2q = compute_mapq_pe_bwa(
                score["tot"], al.score2, 0, p.fill.smatch, al.sub_n,
                0.0, 0.0, s1["score"], s2["score"], al.score2_m1,
                al.score2_m2, sam1.mapq, sam2.mapq)
            sam1.mapq, sam2.mapq = m1q, m2q
            sam1.asc = sam2.asc = score["tot"]
            sam1.zs = sam2.zs = al.score2
            sam1.flag = sam2.flag = SAM_PAIRED | SAM_MAPPED_PAIRED
            if strand:
                sam1.flag |= SAM_REVERSED | SAM_FIRST_IN_PAIR
                sam2.flag |= SAM_MATE_REVERSED | SAM_SECOND_IN_PAIR
            else:
                sam1.flag |= SAM_MATE_REVERSED | SAM_FIRST_IN_PAIR
                sam2.flag |= SAM_REVERSED | SAM_SECOND_IN_PAIR
        elif ok1:
            sam1.zs = al.score2_m1
            sam1.flag = SAM_PAIRED | SAM_MATE_UNMAPPED | SAM_FIRST_IN_PAIR
            sam2.flag = SAM_PAIRED | SAM_UNMAPPED | SAM_SECOND_IN_PAIR
            if strand:
                sam1.flag |= SAM_REVERSED
            sam2.rname = sam1.rname
            sam2.pos = sam1.pos
            sam2.mapq = sam1.mapq
            sam2.cigar = "*"
            sam2.pnext = sam1.pnext = sam1.pos
            sam2.tlen = sam1.tlen = 0
        elif ok2:
            sam1.zs = al.score2_m2
            sam1.flag = SAM_PAIRED | SAM_UNMAPPED | SAM_FIRST_IN_PAIR
            sam2.flag = SAM_PAIRED | SAM_MATE_UNMAPPED | SAM_SECOND_IN_PAIR
            if not strand:
                sam2.flag |= SAM_REVERSED
            sam1.rname = sam2.rname
            sam1.pos = sam2.pos
            sam1.mapq = sam2.mapq
            sam1.cigar = "*"
            sam1.pnext = sam2.pnext = sam2.pos
            sam1.tlen = sam2.tlen = 0
        else:
            sam1.flag = sam2.flag = (SAM_PAIRED | SAM_UNMAPPED
                                     | SAM_MATE_UNMAPPED)

    # ---- fill_orphan (aligner_ksw2.hpp:2566-2711) ----
    def fill_orphan(self, start, end, read, score_only=True, sam=None):
        from . import ksw2
        se = self.se
        p = self.p.fill
        text = se.text
        out = _zero_score()
        ref_occ = start
        ref = text[start:end + 1]
        if score_only:
            sc, qb, qe, tb, te = local_align(read, ref, p.smatch,
                                             p.smismatch, p.gapo, p.gape)
            end = start + te
            start += tb
            ez = ksw2.extz(read, ref[tb:te + 1], flags=ksw2.SCORE_ONLY,
                           smatch=p.smatch, smismatch=p.smismatch,
                           gapo=p.gapo, gape=p.gape)
            out["score"] = ez["score"]
            out["pos"] = start
            if not se.valid(start, end - start + 1):
                out["score"] = -(2 ** 31)
            return out, start, end
        # finalize: global extz over the given window
        ez = ksw2.extz(read, ref, flags=0, smatch=p.smatch,
                       smismatch=p.smismatch, gapo=p.gapo, gape=p.gape)
        cig = [(o, l) for o, l in ez["cigar"]]
        sam.lift_cigar = cigar_string(cig)
        md, nm = write_md_core(ref, read, cig)
        sam.lift_md, sam.lift_nm = md, nm
        rn, off = se.index(ref_occ)
        sam.asc = ez["score"]
        sam.lift_pos = off + 1
        sam.lift_rname = rn
        sam.lift_rlen = len(ref)
        lpos, lops = se.lift_cigar(ref_occ, cig)
        lrlen = cigar_rlen(lops)
        if lops and lrlen > 0:
            lrn, loff = se.index(lpos)
            sam.pos = loff + 1
            sam.rname = lrn
            sam.cigar = cigar_string(lops)
            lref = text[lpos:lpos + lrlen]
            sam.md, sam.nm = write_md_core(lref, read, lops)
            sam.rlen = lrlen
            out["score"] = ez["score"]
            out["pos"] = start
        else:
            sam.pos = 0
            sam.rname = "*"
            sam.cigar = "*"
            sam.rlen = 0
            sam.unmapped_lft = True
            out["unmapped_lft"] = True
        return out, start, end

    def paired_chain_orphan_score(self, al: PEAlignment, chain_i, mean,
                                  std_dev, score_only=True, start=0, end=0):
        p = self.p
        n = self.se.n
        chain = al.chains[chain_i]
        strand = self._strand_of(chain)
        mate1, mate2 = al.mate_reads(strand)
        score = {"tot": 0, "dist": 0, "m1": _zero_score(),
                 "m2": _zero_score(), "chain_i": chain_i,
                 "pos": (0, 0), "strand": strand, "fin1": None,
                 "fin2": None}
        m1_ids, m2_ids = [], []
        lm_pos, rm_pos = n + 1, 0
        for a in reversed(chain.anchors):
            mem = al.mems[al.anchors[a][0]]
            occ = mem.occs[al.anchors[a][1]]
            rm_pos = max(rm_pos, occ + mem.len)
            lm_pos = min(lm_pos, occ)
            if (mem.mate & 1) == 0:
                m1_ids.append(a)
            else:
                m2_ids.append(a)
        clamp = n - 10  # reference: n - idx.get_w() (PFP window w = 10)
        if score_only:
            if m1_ids:
                s1 = chain_score(self.se, m1_ids, al.anchors, al.mems,
                                 al.min_score_m1, mate1, p.fill)
                start = rm_pos + int(math.floor(mean - 4 * std_dev))
                end = rm_pos + int(math.ceil(mean + 4 * std_dev))
                start = min(max(start, 0), clamp)
                end = min(end, clamp)
                s2 = _zero_score()
                if start < end:
                    s2, start, end = self.fill_orphan(start, end, mate2)
                score["pos"] = (start, end)
                score["m1"] = {"score": s1["score"], "pos": s1["pos"],
                               "lft": self.se.lift(s1["pos"]),
                               "unmapped_lft": False}
                score["m2"] = {"score": s2["score"], "pos": s2["pos"],
                               "lft": self.se.lift(s2["pos"]),
                               "unmapped_lft": False}
            else:
                s2 = chain_score(self.se, m2_ids, al.anchors, al.mems,
                                 al.min_score_m2, mate2, p.fill)
                start = lm_pos + int(math.floor(-mean - 4 * std_dev))
                end = lm_pos + int(math.ceil(-mean + 4 * std_dev))
                start = min(max(start, 0), clamp)
                end = min(end, clamp)
                s1 = _zero_score()
                if start < end:
                    s1, start, end = self.fill_orphan(start, end, mate1)
                score["pos"] = (start, end)
                score["m1"] = {"score": s1["score"], "pos": s1["pos"],
                               "lft": self.se.lift(s1["pos"]),
                               "unmapped_lft": False}
                score["m2"] = {"score": s2["score"], "pos": s2["pos"],
                               "lft": self.se.lift(s2["pos"]),
                               "unmapped_lft": False}
        else:
            if m1_ids:
                s1 = chain_score(self.se, m1_ids, al.anchors, al.mems,
                                 al.min_score_m1, mate1, p.fill,
                                 score_only=False)
                self._emit_mate(al.sam_m1, s1)
                if s1.get("finalized"):
                    al.sam_m1.zs = al.score2_m1
                    al.sam_m1.mapq = compute_mapq_se_bwa(
                        al.sam_m1.asc, al.score2_m1, al.sam_m1.rlen,
                        al.len1, p.min_len, p.fill.smatch,
                        p.fill.smismatch, sub_n=al.sub_n)
                s2o = _zero_score()
                if start < end:
                    s2o, _, _ = self.fill_orphan(
                        start, end, mate2, score_only=False,
                        sam=al.sam_m2)
                al.sam_m2.mapq = compute_mapq_se_bwa(
                    al.sam_m2.asc, al.score2_m2, al.sam_m2.rlen, al.len2,
                    p.min_len, p.fill.smatch, p.fill.smismatch,
                    sub_n=al.sub_n)
                score["m1"] = {"score": s1["score"], "pos": s1["pos"],
                               "lft": self.se.lift(s1["pos"]),
                               "unmapped_lft": s1.get("unmapped_lft",
                                                      False)}
                score["m2"] = {"score": s2o["score"], "pos": s2o["pos"],
                               "lft": self.se.lift(s2o["pos"]),
                               "unmapped_lft": s2o.get("unmapped_lft",
                                                       False)}
                score["fin1"], score["fin2"] = s1, None
            else:
                s1o = _zero_score()
                if start < end:
                    s1o, _, _ = self.fill_orphan(
                        start, end, mate1, score_only=False,
                        sam=al.sam_m1)
                s2 = chain_score(self.se, m2_ids, al.anchors, al.mems,
                                 al.min_score_m2, mate2, p.fill,
                                 score_only=False)
                self._emit_mate(al.sam_m2, s2)
                if s2.get("finalized"):
                    al.sam_m2.zs = al.score2_m2
                    al.sam_m2.mapq = compute_mapq_se_bwa(
                        al.sam_m2.asc, al.score2_m2, al.sam_m2.rlen,
                        al.len2, p.min_len, p.fill.smatch,
                        p.fill.smismatch, sub_n=al.sub_n)
                al.sam_m1.mapq = compute_mapq_se_bwa(
                    al.sam_m1.asc, al.score2_m1, al.sam_m1.rlen, al.len1,
                    p.min_len, p.fill.smatch, p.fill.smismatch,
                    sub_n=al.sub_n)
                score["m1"] = {"score": s1o["score"], "pos": s1o["pos"],
                               "lft": self.se.lift(s1o["pos"]),
                               "unmapped_lft": s1o.get("unmapped_lft",
                                                       False)}
                score["m2"] = {"score": s2["score"], "pos": s2["pos"],
                               "lft": self.se.lift(s2["pos"]),
                               "unmapped_lft": s2.get("unmapped_lft",
                                                      False)}
                score["fin1"], score["fin2"] = None, s2
        score["dist"] = abs(score["m2"]["pos"] -
                            (score["m1"]["pos"] + al.len1))
        score["tot"] = self._ins_tot(score["m1"]["score"],
                                     score["m2"]["score"],
                                     score["dist"], al)
        return score

    def orphan_recovery(self, al: PEAlignment, mean, std_dev):
        best = []
        for i in range(len(al.chains)):
            score = self.paired_chain_orphan_score(al, i, mean, std_dev)
            if score["tot"] >= al.min_score:
                replaced = False
                j = 0
                while j < len(best):
                    b = best[j]
                    if (abs(b["m1"]["lft"] - score["m1"]["lft"])
                            < self.p.region_dist and
                            abs(b["m2"]["lft"] - score["m2"]["lft"])
                            < self.p.region_dist):
                        if score["tot"] > b["tot"]:
                            if replaced:
                                best[j] = {"tot": 0, "dist": 0,
                                           "m1": _zero_score(),
                                           "m2": _zero_score(),
                                           "chain_i": i, "pos": (0, 0)}
                            else:
                                best[j] = score
                                replaced = True
                        else:
                            j = len(best)
                            replaced = True
                    j += 1
                if not replaced:
                    best.append(score)
        while len(best) < 2:
            best.append({"tot": 0, "dist": 0, "m1": _zero_score(),
                         "m2": _zero_score(),
                         "chain_i": len(al.chains), "pos": (0, 0)})
        best.sort(key=lambda s: (-s["tot"], -s["m1"]["lft"],
                                 -s["m2"]["lft"]))
        if best[0]["tot"] < al.min_score:
            return False
        j = 1
        al.sub_n = 0
        while (j < len(best) and best[j]["tot"]
               >= best[0]["tot"] - self.max_penalty):
            al.sub_n += 1
            j += 1
        al.score2 = best[1]["tot"]
        al.score2_m1 = best[1]["m1"]["score"]
        al.score2_m2 = best[1]["m2"]["score"]
        al.second_best_score = al.score2 >= al.min_score
        start, end = best[0]["pos"]
        fin = self.paired_chain_orphan_score(
            al, best[0]["chain_i"], mean, std_dev, score_only=False,
            start=start, end=end)
        self._finalize_pair(al, fin, orphan=True)
        al.aligned = fin["tot"] >= al.min_score
        return al.aligned

    # ---- the align(paired_alignment_t&) core (:1000-1326) ----
    def _align_core(self, al: PEAlignment, finalize=True):
        self._find_and_filter(al)
        if self.p.secondary_chains:
            al.anchors, al.chains = find_chains_secondary(al.mems,
                                                          self.p.chain)
        else:
            al.anchors, al.chains = find_chains(al.mems, self.p.chain)
        al.chained = bool(al.chains)
        if not al.chained:
            return False
        self.get_best_scores(al, self.p.check_k)
        if al.best_scores[0]["tot"] < al.min_score:
            al.sam_m1.alt_haplotypes.clear()
            al.sam_m1.alt_pos.clear()
            al.sam_m1.alt_scores.clear()
            al.sam_m2.alt_haplotypes.clear()
            al.sam_m2.alt_pos.clear()
            al.sam_m2.alt_scores.clear()
            return False
        if finalize:
            score = self.paired_chain_score(
                al, al.best_scores[0]["chain_i"], score_only=False)
            self._finalize_pair(al, score)
            al.aligned = score["tot"] >= al.min_score
        else:
            al.aligned = al.best_scores[0]["tot"] >= al.min_score
        return al.aligned

    def learn_batch(self, pairs):
        """learn_fragment_model (:816-885) over a batch of
        ((n1, s1, q1), (n2, s2, q2)) pairs."""
        count, mean, m2 = 0, 0.0, 0.0
        for (n1, s1, q1), (n2, s2, q2) in pairs:
            al = PEAlignment(n1, s1, q1, s2, q2)
            al.mean, al.std_dev = self.ins.mean, self.ins.std_dev
            if self._align_core(al, finalize=False) and (
                    not al.second_best_score or
                    (al.best_scores[0]["tot"] - al.best_scores[1]["tot"])
                    > self.ins.score_gap_threshold):
                value = float(al.best_scores[0]["dist"])
                count += 1
                delta = value - mean
                mean += delta / count
                m2 += delta * (value - mean)
        self.ins.merge(count, mean, m2)
        return self.ins.complete

    def align_pair(self, r1, r2):
        """statistics_t align inner loop (:888-920): returns the two
        SamRecords with orphan recovery applied."""
        n1, s1, q1 = r1
        n2, s2, q2 = r2
        qname = n1[:-2] if n1.endswith(("/1", "/2")) else n1
        al = PEAlignment(qname, s1, q1, s2, q2)
        al.mean, al.std_dev = self.ins.mean, self.ins.std_dev
        self.stats["pairs"] += 1
        if not self._align_core(al, finalize=True) and al.chained:
            self.stats["orphan"] += 1
            if self.p.find_orphan:
                self.orphan_recovery(al, self.ins.mean, self.ins.std_dev)
            if al.aligned:
                self.stats["orphan_recovered"] += 1
        if al.aligned:
            self.stats["paired_aligned"] += 1
        return al.sam_m1, al.sam_m2
