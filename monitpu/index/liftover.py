"""Haplotype -> reference coordinate liftover.

Replaces levioSAM's per-haplotype ins/del/snp bitvector triple
(thirdparty levioSAM lift::Lift, used via include/aligner/liftidx.hpp:
89-95, 159-164) with explicit collinear-segment tables built during
haplotype construction: each haplotype is a sequence of segments that
are either collinear with the reference (M-segments) or insertions
(hap-only). lift(pos) is one searchsorted; lift_cigar walks the
alignment ops across segment boundaries, converting hap-only stretches
to insertions and reference jumps (deletions in the haplotype) to D ops
— the levioSAM lift_cigar semantics.

Coordinates: both sides are *global* positions in the pangenome text;
lifted positions land inside the reference contig's region (the ref
contigs are the first sequences of the text), so seqidx translation
(Aligner.pos_to_ref) yields reference contig names directly.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np


class Liftover:
    """Segment tables: hap_starts (sorted, global), ref_starts (global),
    is_ins flags. The identity region (the ref contigs themselves) is
    one big M-segment each."""

    def __init__(self, hap_starts, ref_starts, is_ins, seg_ends):
        self.hap_starts = np.asarray(hap_starts, np.int64)
        self.ref_starts = np.asarray(ref_starts, np.int64)
        self.is_ins = np.asarray(is_ins, bool)
        self.seg_ends = np.asarray(seg_ends, np.int64)  # hap end, exclusive

    @classmethod
    def from_segments(cls, segments):
        """segments: list of (hap_start, ref_start, length, is_ins),
        sorted by hap_start, covering every hap position."""
        hs = [s[0] for s in segments]
        rs = [s[1] for s in segments]
        ins = [s[3] for s in segments]
        ends = [s[0] + s[2] for s in segments]
        return cls(hs, rs, ins, ends)

    def _seg(self, pos):
        k = int(np.searchsorted(self.hap_starts, pos, side="right") - 1)
        return max(0, min(k, len(self.hap_starts) - 1))

    def lift(self, pos: int) -> int:
        k = self._seg(pos)
        if self.is_ins[k]:
            # inside an insertion: the base before it (levioSAM convention)
            return int(self.ref_starts[k])
        return int(self.ref_starts[k]) + (pos - int(self.hap_starts[k]))

    def lift_batch(self, pos):
        pos = np.asarray(pos, np.int64)
        k = np.clip(np.searchsorted(self.hap_starts, pos, side="right") - 1,
                    0, len(self.hap_starts) - 1)
        lifted = self.ref_starts[k] + (pos - self.hap_starts[k])
        return np.where(self.is_ins[k], self.ref_starts[k], lifted)

    def lift_cigar(self, pos: int, ops):
        """(hap pos, ops) -> (ref pos, lifted ops).

        ops: [(op, len)] with op in 'MID'; M/D consume hap positions.
        Returns (ref_pos, new_ops); new_ops may be empty if the whole
        alignment sits inside an insertion (unmapped after lift,
        reference aligner_ksw2.hpp:3166-3172)."""
        out = []

        def push(op, l):
            if l <= 0:
                return
            if out and out[-1][0] == op:
                out[-1][1] += l
            else:
                out.append([op, l])

        h = pos
        # the record anchors at the first lifted M/D base; alignments that
        # lift entirely into an insertion come back empty (unmapped).
        ref_pos = None
        last_ref = None  # ref coordinate after the previous consumed base
        for op, ln in ops:
            if op == "I":
                push("I", ln)
                continue
            # op M or D: consume ln hap positions
            remaining = ln
            while remaining > 0:
                k = self._seg(h)
                seg_end = int(self.seg_ends[k])
                take = min(remaining, max(seg_end - h, 0))
                if take <= 0:  # past final segment: treat as insertion
                    take, in_ins, r = remaining, True, 0
                else:
                    in_ins = bool(self.is_ins[k])
                    r = int(self.ref_starts[k]) + (h - int(self.hap_starts[k]))
                if in_ins:
                    if op == "M":
                        push("I", take)
                    # "D" over inserted bases vanishes in ref space
                else:
                    if last_ref is not None and r > last_ref:
                        push("D", r - last_ref)   # hap deletion -> ref gap
                    if ref_pos is None:
                        ref_pos = r
                    push(op, take)
                    last_ref = r + take
                h += take
                remaining -= take
        if ref_pos is None:
            return 0, []
        return ref_pos, [(o, l) for o, l in out]


class LiftIndex:
    """Per-sequence Liftover container + serialization (the .ldx
    equivalent, reference include/aligner/liftidx.hpp)."""

    def __init__(self, seq_starts, lifts):
        self.seq_starts = np.asarray(seq_starts, np.int64)
        self.lifts = lifts  # list[Liftover|None]; None = identity

    def _which(self, pos):
        s = int(np.searchsorted(self.seq_starts, pos, side="right") - 1)
        return max(0, min(s, len(self.lifts) - 1))

    def lift(self, pos: int) -> int:
        lo = self.lifts[self._which(pos)]
        return pos if lo is None else lo.lift(pos)

    def lift_cigar(self, pos: int, ops):
        lo = self.lifts[self._which(pos)]
        if lo is None:
            return pos, [list(o) for o in ops]
        return lo.lift_cigar(pos, ops)

    def save(self, prefix: str):
        arrays = {"seq_starts": self.seq_starts}
        meta = []
        for i, lo in enumerate(self.lifts):
            if lo is None:
                meta.append(0)
                continue
            meta.append(1)
            arrays[f"hs{i}"] = lo.hap_starts
            arrays[f"rs{i}"] = lo.ref_starts
            arrays[f"ins{i}"] = lo.is_ins
            arrays[f"se{i}"] = lo.seg_ends
        np.savez_compressed(prefix + ".ldx.npz", **arrays)
        pathlib.Path(prefix + ".ldx.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, prefix: str):
        data = np.load(prefix + ".ldx.npz")
        meta = json.loads(pathlib.Path(prefix + ".ldx.json").read_text())
        lifts = []
        for i, m in enumerate(meta):
            if m == 0:
                lifts.append(None)
            else:
                lifts.append(Liftover(data[f"hs{i}"], data[f"rs{i}"],
                                      data[f"ins{i}"], data[f"se{i}"]))
        return cls(data["seq_starts"], lifts)
