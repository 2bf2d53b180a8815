"""Legacy single-MEM extender: the `moni extend` tool.

Reference: include/extender/extender_ksw2.hpp — per read and per strand,
find the longest MEM (find_longest_mem, :262-295), ksw2-extend the left
and right read contexts around one occurrence of it (extend, :306-520),
and emit a SAM record when the score beats 20 + 8*ln(|read|) (:222-236),
with the Bowtie2-binned MAPQ (:649-676, tables :800-833). The dispatcher
runs BOTH strands independently per read (extend_reads_dispatcher.hpp
:323-334), so one read may emit up to two records.

TPU-native shape: reads are batched, both strands form one lane set; the
longest-MEM pick is a masked argmax over the batched MEM arrays; the
left+MEM+right piecewise extension collapses into one fitting alignment
of the whole read inside a window anchored at the MEM occurrence (same
objective, see ops/sw.py docstring) scored on device; only lanes whose
score clears the gate pay for the host traceback/finalize pass.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..index.alphabet import encode_seq, revcomp_codes, decode_seq
from ..ops.ms import find_mems_batch, AUTO_WORK_PER_READ
from ..ops.sw import sw_fit_banded
from .aligner import Aligner, AlignConfig, _host_finalize
from .sam import SamRecord, SAM_REVERSED, cigar_ops_to_string
from ..utils.timers import phase_timer

# Bowtie2 MAPQ bins (extender_ksw2.hpp:800-833)
UNP_NOSEC_PERF = 44
UNP_NOSEC = (43, 42, 41, 36, 32, 27, 20, 11, 4, 1, 0)
UNP_SEC_PERF = (2, 16, 23, 30, 31, 32, 34, 36, 38, 40, 42)
UNP_SEC = (
    (2, 2, 2, 1, 1, 0, 0, 0, 0, 0, 0),
    (20, 14, 7, 3, 2, 1, 0, 0, 0, 0, 0),
    (20, 16, 10, 6, 3, 1, 0, 0, 0, 0, 0),
    (20, 17, 13, 9, 3, 1, 1, 0, 0, 0, 0),
    (21, 19, 15, 9, 5, 2, 2, 0, 0, 0, 0),
    (22, 21, 16, 11, 10, 5, 0, 0, 0, 0, 0),
    (23, 22, 19, 16, 11, 0, 0, 0, 0, 0, 0),
    (24, 25, 21, 30, 0, 0, 0, 0, 0, 0, 0),
    (30, 26, 29, 0, 0, 0, 0, 0, 0, 0, 0),
    (30, 27, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    (30, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
)


def compute_mapq_extender(score, score2, min_score, read_l, smatch=2):
    """Bowtie2-binned MAPQ (extender_ksw2.hpp:649-676)."""
    max_score = read_l * smatch
    best = max_score - score
    span = max(max_score - min_score, 1)
    best_bin = min(int(best * (10.0 / span) + 0.5), 10)
    if score2 > min_score:
        diff_bin = min(int((score - score2) * (10.0 / span) + 0.5), 10)
        if best == 0:
            return UNP_SEC_PERF[best_bin]
        return UNP_SEC[diff_bin][best_bin]
    if best == 0:
        return UNP_NOSEC_PERF
    return UNP_NOSEC[best_bin]


class Extender:
    """Batched legacy extension. Wraps an Aligner for the index tables,
    seqidx mapping and native finalize."""

    def __init__(self, aligner: Aligner):
        self.al = aligner
        self.cfg = aligner.cfg
        self.stats = {"processed": 0, "extended": 0}

    def extend_batch(self, reads):
        """reads: list of (name, seq, qual) -> list of SamRecord (one per
        strand that clears the score gate; unmapped record when neither
        strand does, mirroring st_extend's per-read accounting)."""
        cfg = self.cfg
        al = self.al
        B = len(reads)
        M = cfg.read_pad
        fwd = np.zeros((B, M), np.int32)
        rc = np.zeros((B, M), np.int32)
        lens = np.zeros(B, np.int32)
        fcodes, rcodes = [], []
        for b, (_, seq, _) in enumerate(reads):
            codes = encode_seq(seq[:M])
            r = revcomp_codes(codes)
            fwd[b, :len(codes)] = codes
            rc[b, :len(codes)] = r
            lens[b] = len(codes)
            fcodes.append(codes)
            rcodes.append(r)

        # lanes [0, B) = forward, [B, 2B) = reverse complement
        with phase_timer("extend device"):
            lanes = jnp.asarray(np.concatenate([fwd, rc]))
            lens2 = jnp.asarray(np.concatenate([lens, lens]))
            mp, ml, mi, mc, _ctr = find_mems_batch(
                al.tables, lanes, lens2, max_mems=cfg.max_mems,
                min_len=cfg.min_len, work_per_read=cfg.lce_work or 96)
            # longest MEM per lane (find_longest_mem; ties -> leftmost,
            # same as the reference's strict > update)
            k = jnp.arange(cfg.max_mems)[None, :]
            mlv = jnp.where(k < mc[:, None], ml, -1)
            pick = jnp.argmax(mlv, axis=1)
            mem_len = jnp.take_along_axis(mlv, pick[:, None], 1)[:, 0]
            mem_pos = jnp.take_along_axis(mp, pick[:, None], 1)[:, 0]
            mem_idx = jnp.take_along_axis(mi, pick[:, None], 1)[:, 0]
            has = mem_len >= cfg.min_len

            n = al.tables["n"]
            ws = jnp.clip(mem_pos - mem_idx - cfg.margin, 0, n - 1)
            from ..ops.ms import extract_windows
            Wt = -(-(M + 2 * cfg.margin + 8) // 8) * 8
            target = extract_windows(al.tables, ws, Wt)
            tlen = jnp.clip(n - ws, 0, Wt)
            out = sw_fit_banded(lanes, lens2, target, tlen, cfg.sw,
                                band_w=cfg.margin)
            score = np.asarray(jnp.where(has, out["score"], -(2**28)))
            tend = np.asarray(out["tend"])
            ws = np.asarray(ws)

        # gate: score > 20 + 8*ln(len) (extender_ksw2.hpp:222,234)
        gates = np.array([int(20 + 8 * math.log(max(int(l), 2)))
                          for l in lens] * 2)
        passed = score > gates

        with phase_timer("extend finalize"):
            q = np.concatenate([fwd, rc]).astype(np.int8)
            fin, _ = _host_finalize(al.index, q, np.concatenate([lens, lens]),
                                    ws, passed, cfg, tends=tend,
                                    expected=score)

        records = []
        for b, (name, seq, qual) in enumerate(reads):
            self.stats["processed"] += 1
            emitted = False
            for strand in (0, 1):
                lane = b + strand * B
                if not passed[lane] or not fin["ops"][lane] or \
                        fin["score"][lane] <= gates[lane]:
                    continue
                emitted = True
                self.stats["extended"] += 1
                codes = rcodes[b] if strand else fcodes[b]
                rec = SamRecord(qname=name,
                                seq=decode_seq(codes) if strand else seq,
                                qual=(qual[::-1] if strand else qual) or "*")
                rec.flag = SAM_REVERSED if strand else 0
                pos_global = int(ws[lane]) + int(fin["tstart"][lane])
                al.set_alignment_fields(
                    rec, pos_global, fin["ops"][lane], fin["md"][lane],
                    int(fin["nm"][lane]), int(fin["rlen"][lane]), codes)
                rec.asc = int(fin["score"][lane])
                rec.mapq = compute_mapq_extender(
                    rec.asc, 0, int(gates[lane]), int(lens[b]),
                    cfg.sw.smatch)
                records.append(rec)
            if not emitted:
                records.append(SamRecord(qname=name, seq=seq,
                                         qual=qual or "*"))
        return records
