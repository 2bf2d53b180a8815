"""Reference-faithful piecewise chain alignment (oracle side).

fill_chain (include/aligner/aligner_ksw2.hpp:2752-3196) and chain_score
(:2018-2098) transliterated over monitpu data: left/right read-context
extension (KSW_EZ_EXTZ_ONLY|KSW_EZ_RIGHT, score from ez.mqe), pure-gap
closed forms, per-gap global alignments (KSW_EZ_RIGHT), whole-read
global realign when anchors overlap, CIGAR merge with M-run fusion,
write_MD_core MD/NM, seqidx::valid rejection, and liftover of the
haplotype-coordinate alignment into reference coordinates.

Bug-for-bug fidelity notes (deliberate, required for output parity):
  * left-context extraction when mem_pos <= ext_len uses length
    ext_len - mem_pos from text position 0 (aligner_ksw2.hpp:2794-2795)
    — overlapping INTO the MEM — instead of the mem_pos available
    characters; reproduced as-is.
  * a pure-deletion gap between anchors takes its length from the READ
    gap (zero) rather than the reference gap (aligner_ksw2.hpp:2940),
    emitting a "0D" op and the minimum gap-open cost; reproduced as-is.
  * the finalize pass returns score 0 in the non-realign arm
    (ez is zero-initialized, :3161); callers use the score-only pass's
    score, and AS is set from the recomputed piecewise sum (:3127), so
    nothing downstream observes it — we return the piecewise sum.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import ksw2

# MD uses nt4 letters; SEP and N both render/compare as N
# (seq_nt4_table maps every non-ACGT byte to 4, aligner_ksw2.hpp:3266)
_MD_CHAR = "NACGTN"


def _nt4_eq(a: int, b: int) -> bool:
    ea = 4 if a in (0, 5) else a
    eb = 4 if b in (0, 5) else b
    return ea == eb


@dataclasses.dataclass(frozen=True)
class FillParams:
    """Scoring knobs of config_t (aligner_ksw2.hpp:104-115)."""
    smatch: int = 2
    smismatch: int = 4
    gapo: int = 4
    gapo2: int = 13
    gape: int = 2
    gape2: int = 1
    ext_len: int = 100


def write_md_core(tseq, qseq, ops):
    """write_MD_core (include/common/sam.hpp:249-287): MD string + NM
    from an op list over target codes tseq / query codes qseq. No
    trailing '0' is emitted (reference behavior)."""
    mdz = []
    l_md = 0
    nm = 0
    q_off = t_off = 0
    for op, length in ops:
        if op == "M":
            for j in range(length):
                if not _nt4_eq(int(qseq[q_off + j]), int(tseq[t_off + j])):
                    mdz.append(str(l_md))
                    mdz.append(_MD_CHAR[int(tseq[t_off + j])])
                    l_md = 0
                    nm += 1
                else:
                    l_md += 1
            q_off += length
            t_off += length
        elif op == "I":
            q_off += length
            nm += length
        elif op == "D":
            mdz.append(str(l_md))
            mdz.append("^")
            for j in range(length):
                mdz.append(_MD_CHAR[int(tseq[t_off + j])])
            l_md = 0
            t_off += length
            nm += length
    if l_md > 0:
        mdz.append(str(l_md))
    return "".join(mdz), nm


def cigar_rlen(ops) -> int:
    """bam_cigar2rlen: reference-consuming length."""
    return sum(l for op, l in ops if op in "MD")


def _merge_push(cigar, op, length):
    if cigar and cigar[-1][0] == op:
        cigar[-1][1] += length
    else:
        cigar.append([op, length])


def fill_chain(ctx, mems, chain_anchors, lcs, rcs, seq,
               params: FillParams = FillParams(), score_only=True,
               realign=False):
    """ctx must provide: text (int8 codes), n, valid(pos, len) -> bool,
    lift(pos) -> pos, lift_cigar(pos, ops) -> (pos, ops) (identity when
    no liftidx). chain_anchors: list of (mem_i, occ_i) in forward
    order. lcs: REVERSED left read context codes; rcs: right context
    codes; seq: full read codes (strand already applied).

    Returns dict(score, pos, unmapped_lft, and under score_only=False:
    lift_pos/lift_cigar/lift_md/lift_nm/lift_rlen, pos/cigar/md/nm/rlen
    (lifted primary fields), as)."""
    p = params
    text = ctx.text
    n = ctx.n
    kw = dict(smatch=p.smatch, smismatch=p.smismatch, gapo=p.gapo,
              gape=p.gape)
    flags = ksw2.SCORE_ONLY if score_only else ksw2.EXTZ_ONLY

    out = {"unmapped_lft": False}
    score_lc = 0
    score_rc = 0
    ez_lc = ez_rc = None
    lcs_len = len(lcs)
    rcs_len = len(rcs)

    if lcs_len > 0:
        mem_pos = mems[chain_anchors[0][0]].occs[chain_anchors[0][1]]
        if mem_pos > p.ext_len:       # aligner_ksw2.hpp:2793-2795
            lc_occ, lc_len = mem_pos - p.ext_len, p.ext_len
        else:                         # (reference quirk, see module doc)
            lc_occ, lc_len = 0, p.ext_len - mem_pos
        lc = np.ascontiguousarray(text[lc_occ:lc_occ + lc_len][::-1])
        ez_lc = ksw2.extz(lcs, lc, flags=flags, **kw)
        score_lc = ez_lc["mqe"]

    if rcs_len > 0:
        last = mems[chain_anchors[-1][0]]
        rc_occ = last.occs[chain_anchors[-1][1]] + last.len
        rc_len = p.ext_len if rc_occ < n - p.ext_len else n - rc_occ
        rc = text[rc_occ:rc_occ + rc_len]
        ez_rc = ksw2.extz(rcs, rc, flags=flags, **kw)
        score_rc = ez_rc["mqe"]

    total = score_lc + score_rc

    mem_pos = mems[chain_anchors[0][0]].occs[chain_anchors[0][1]]
    last_mem = mems[chain_anchors[-1][0]]
    mem_span = (last_mem.occs[chain_anchors[-1][1]] + last_mem.len
                - mem_pos)
    lc_used = (ez_lc["mqe_t"] + 1) if lcs_len > 0 else 0
    rc_used = (ez_rc["mqe_t"] + 1) if rcs_len > 0 else 0
    ref_pos = 0 if lc_used > mem_pos else mem_pos - lc_used
    ref_len = lc_used + mem_span + rc_used
    ref = text[ref_pos:ref_pos + ref_len]
    out["pos"] = ref_pos

    # overlap detection (aligner_ksw2.hpp:2895-2908)
    mems_overlap = False
    last_ref = mem_pos + mems[chain_anchors[0][0]].len
    last_seq = (mems[chain_anchors[0][0]].idx
                + mems[chain_anchors[0][0]].len)
    for mi, oi in chain_anchors[1:]:
        if mems_overlap:
            break
        ref_occ = mems[mi].occs[oi]
        seq_occ = mems[mi].idx
        if last_ref > ref_occ or last_seq > seq_occ:
            mems_overlap = True
        last_ref = ref_occ + mems[mi].len
        last_seq = seq_occ + mems[mi].len

    ez_cc = []   # per-gap (score, ops) pairs
    if not mems_overlap and not realign:
        last_ref = mem_pos + mems[chain_anchors[0][0]].len
        last_seq = (mems[chain_anchors[0][0]].idx
                    + mems[chain_anchors[0][0]].len)
        for k in range(1, len(chain_anchors)):
            mi, oi = chain_anchors[k]
            ref_occ = mems[mi].occs[oi]
            seq_occ = mems[mi].idx
            mem_len = mems[mi].len
            if last_ref == ref_occ:
                if last_seq < seq_occ:
                    l = seq_occ - last_seq
                    gsc = -min(p.gapo + l * p.gape, p.gapo2 + l * p.gape2)
                    ez_cc.append((gsc, [["I", l]]))
                else:
                    ez_cc.append((0, []))
            else:
                if last_seq == seq_occ:
                    # reference quirk: l from the READ gap == 0 -> "0D"
                    l = seq_occ - last_seq
                    gsc = -min(p.gapo + l * p.gape, p.gapo2 + l * p.gape2)
                    ez_cc.append((gsc, [["D", l]]))
                else:
                    pm, po = chain_anchors[k - 1]
                    cc_occ = mems[pm].occs[po] + mems[pm].len
                    cc_len = ref_occ - cc_occ
                    cc_occ -= ref_pos
                    ccs_pos = mems[pm].idx + mems[pm].len
                    ccs_len = seq_occ - ccs_pos
                    # global, KSW_EZ_RIGHT, cigar even in score-only
                    # (the reference overwrites `flag`, :2947)
                    ez = ksw2.extz(seq[ccs_pos:ccs_pos + ccs_len],
                                   ref[cc_occ:cc_occ + cc_len],
                                   flags=0, **kw)
                    ez_cc.append((ez["score"],
                                  [[o, l] for o, l in ez["cigar"]]))
            pm, po = chain_anchors[k - 1]
            total += mems[pm].len * p.smatch + ez_cc[-1][0]
            last_ref = ref_occ + mem_len
            last_seq = seq_occ + mem_len
        total += mems[chain_anchors[-1][0]].len * p.smatch
    else:
        realign = True
        ez = ksw2.extz(seq, ref, flags=ksw2.SCORE_ONLY if score_only else 0,
                       **kw)
        total = ez["score"]

    is_valid = ctx.valid(ref_pos, ref_len)
    if not is_valid:
        total = -(2**31)            # INT32_MIN stand-in (:2998)
    out["score"] = total

    if not (is_valid and not score_only):
        return out

    # ---- finalize: CIGAR merge / realign traceback (:3000-3111) ----
    if realign:
        ez = ksw2.extz(seq, ref, flags=0, **kw)
        cigar = [[o, l] for o, l in ez["cigar"]]
        out["score"] = ez["score"]
    else:
        cigar = []
        if ez_lc is not None:
            for o, l in reversed(ez_lc["cigar"]):
                cigar.append([o, l])
        for k, (mi, oi) in enumerate(chain_anchors):
            _merge_push(cigar, "M", mems[mi].len)
            if k < len(chain_anchors) - 1:
                gap_ops = ez_cc[k][1]
                if gap_ops:
                    if gap_ops[0][0] == "M":
                        cigar[-1][1] += gap_ops[0][1]
                    else:
                        cigar.append(list(gap_ops[0]))
                    for g in gap_ops[1:]:
                        cigar.append(list(g))
        if ez_rc is not None and ez_rc["cigar"]:
            ops = ez_rc["cigar"]
            if ops[0][0] == "M":
                cigar[-1][1] += ops[0][1]
            else:
                cigar.append(list(ops[0]))
            for g in ops[1:]:
                cigar.append(list(g))

    cigar = [(o, l) for o, l in cigar]
    out["lift_cigar"] = cigar
    md, nm = write_md_core(ref, seq, cigar)
    out["lift_md"] = md
    out["lift_nm"] = nm
    out["as"] = out["score"]
    out["lift_pos"] = ref_pos          # 0-based concatenation position
    out["lift_rlen"] = ref_len

    # liftover (:3133-3174)
    lpos, lops = ctx.lift_cigar(ref_pos, cigar)
    lrlen = cigar_rlen(lops)
    if lrlen > 0:
        lref = text[lpos:lpos + lrlen]
        lmd, lnm = write_md_core(lref, seq, lops)
        out["pos"] = lpos
        out["cigar"] = lops
        out["md"] = lmd
        out["nm"] = lnm
        out["rlen"] = lrlen
    else:   # aligned entirely inside an insertion (:3166-3172)
        out["unmapped_lft"] = True
        out["pos"] = 0
        out["cigar"] = []
        out["rlen"] = 0
    return out


def chain_score(ctx, chain_anchor_ids, anchors, mems, min_score, seq,
                params: FillParams = FillParams(), score_only=True):
    """chain_score (aligner_ksw2.hpp:2018-2098): extract the chain's
    anchors + read contexts and run fill_chain; when score_only=False
    and the score clears min_score, run the finalize pass as well.
    chain_anchor_ids: anchor indices in FORWARD order (caller reverses
    the chain_t). Returns the score-pass dict, with finalize fields
    merged in when computed."""
    chain_anchors = [anchors[a] for a in chain_anchor_ids]
    lcs_len = mems[chain_anchors[0][0]].idx
    lcs = np.ascontiguousarray(seq[:lcs_len][::-1])
    rcs_occ = (mems[chain_anchors[-1][0]].idx
               + mems[chain_anchors[-1][0]].len)
    rcs = seq[rcs_occ:]
    score = fill_chain(ctx, mems, chain_anchors, lcs, rcs, seq, params,
                       score_only=True)
    if not score_only and score["score"] >= min_score:
        fin = fill_chain(ctx, mems, chain_anchors, lcs, rcs, seq, params,
                         score_only=False)
        score.update({k: v for k, v in fin.items() if k != "score"})
        score["finalized"] = True
    return score
