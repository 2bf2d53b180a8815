"""Paired-end aligner.

Reference: the paired align path (include/aligner/aligner_ksw2.hpp:
1000-1326), paired_chain_score (:2115-2308), insert-size learning via
Welford accumulators (:816-885), orphan recovery (:1536-1658).

TPU-native layout: each pair contributes FOUR MEM query lanes
(m1F, m2RC offset by |m1|, m2F, m1RC offset by |m2| — the reference's
r_offset scheme, :1106-1109). The DEFAULT path computes the 4-lane
seeds on the TPU (sharded over a mesh when enabled) and finishes pairs
in the native PE runtime (runtime.cpp monitpu_postseed_pe) with exact
reference semantics — direction filter incl. its stats quirk, paired
chaining, insert Gaussian, PE MAPQ with real second-best inputs,
GATK unmapped-mate convention, orphan recovery
(tests/test_parity_pe.py). Insert-size stats are learned from the
first batches with Welford merging; under multi-host data parallelism
the (count, mean, M2) triple is reduced across hosts
(parallel/dist.allreduce_welford).

The extension score pass runs on the TPU through the PE plan/resolve
split (runtime.cpp monitpu_postseed_pe_plan/_resolve + ops/extz.py),
the same score_only/finalize architecture as SE; winner finalize and
orphan recovery run host-side over the banded-certified extz lane.
(The former approximate all-on-TPU fitting path was retired in round 4
once the exact device extz kernel covered its use case.)
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..index.alphabet import encode_seq, revcomp_codes, decode_seq
from ..ops.ms import find_mems_batch
from ..ops.occs import populate_seeds_batch
from .aligner import Aligner, MATE_RC
from ..utils.timers import phase_timer

M1F, M2F, M1RC, M2RC = 0, 1, 2, 3  # MATE_1|MATE_F etc. (mems.hpp:26-29)


@dataclasses.dataclass
class InsertModel:
    """Welford accumulator for the insert-size distribution
    (aligner_ksw2.hpp:816-885). merge() mirrors the mutex-guarded
    cross-thread merge; under pjit data parallelism the (count, mean,
    m2) triple is psum-reduced instead."""
    count: int = 0
    mean: float = 0.0
    m2: float = 0.0
    complete: bool = False
    learning_n: int = 1000

    def add_batch(self, values):
        if self.complete or not len(values):
            return
        c = len(values)
        m = float(np.mean(values))
        m2 = float(np.sum((np.asarray(values) - m) ** 2))
        if self.count > 0:
            t = self.count + c
            delta = self.mean - m
            self.m2 += m2 + (delta * delta * self.count * c) / t
            self.mean = (self.count * self.mean + c * m) / t
            self.count = t
        else:
            self.count, self.mean, self.m2 = c, m, m2
        if self.count >= self.learning_n:
            self.complete = True

    @property
    def std_dev(self):
        return math.sqrt(self.m2 / self.count) if self.count > 1 else 0.0


class PairedAligner:
    """Drives paired batches through the device pipeline + host logic."""

    def __init__(self, aligner: Aligner):
        self.al = aligner
        self.cfg = aligner.cfg
        self.ins = InsertModel()
        self.stats = {"pairs": 0, "paired_aligned": 0, "orphan_recovered": 0}

    # ------------------------------------------------------------------
    def _encode(self, batch, M):
        from ..index.alphabet import encode_batch
        return encode_batch([r[1] for r in batch], M, dtype=np.int8)

    # ------------------------------------------------------------------
    # native post-seed path: device seed stage (4 lanes) + the C++
    # reference-faithful PE runtime (native/runtime.cpp)
    # ------------------------------------------------------------------
    def submit_pair_batch(self, batch1, batch2):
        """Encode + dispatch the 4-lane seed stage (async on device;
        synchronous on the cpu engine)."""
        from ..ops.occs import pack_seeds_wire
        cfg = self.cfg
        al = self.al
        B, M = len(batch1), cfg.read_pad
        m1f, m1r, len1 = self._encode(batch1, M)
        m2f, m2r, len2 = self._encode(batch2, M)
        if cfg.engine == "cpu":
            from .cpu import cpu_seeds
            with phase_timer("pe cpu seeds"):
                packed = cpu_seeds(
                    al.index,
                    np.concatenate([m1f, m2r, m2f, m1r]).astype(np.int8),
                    np.concatenate([len1, len2, len2, len1]),
                    min_len=cfg.min_len, max_occs=cfg.max_occs,
                    n_threads=cfg.postseed_threads)
            return dict(batch1=batch1, batch2=batch2, packed_host=packed,
                        m1f=m1f, m1r=m1r, m2f=m2f, m2r=m2r,
                        len1=len1, len2=len2)
        if al.mesh is not None:
            with phase_timer("pe device dispatch (sharded)"):
                seeds, wire, lanes = al._seed_stage_sharded(
                    [m1f, m2r, m2f, m1r], [len1, len2, len2, len1])
            return dict(batch1=batch1, batch2=batch2, seeds=seeds,
                        wire=wire, sharded=True, lanes=lanes,
                        m1f=m1f, m1r=m1r, m2f=m2f, m2r=m2r,
                        len1=len1, len2=len2)
        max_mems, work, occw = al.seed_pools()
        with phase_timer("pe device dispatch"):
            # TWO SE-shaped dispatches ([m1F, m2RC] and [m2F, m1RC])
            # instead of one 4-lane call: with B pairs == the SE batch
            # size the seed stage REUSES the SE executables — PE seeding
            # adds ZERO compile time on top of SE warmup (VERDICT r4
            # next #3; the 4-lane shape cost a second ~147 s warmup).
            # The packed wires merge host-side: call-A rows are already
            # the PE rows [0, 2B), call-B rows shift by 2B. The routing
            # (_seed_dispatch) also serves index-sharded tables.
            la = np.concatenate([m1f, m2r])
            ln_a = np.concatenate([len1, len2])
            lb = np.concatenate([m2f, m1r])
            ln_b = np.concatenate([len2, len1])
            W, OC = cfg.pack_seeds_per_read * B, cfg.pack_occs_per_read * B
            seeds_a, wire_a, lanes_a = al._seed_dispatch(
                la, ln_a, max_mems, work, W, OC, occw)
            seeds_b, wire_b, lanes_b = al._seed_dispatch(
                lb, ln_b, max_mems, work, W, OC, occw)
            al._prefetch_wire(wire_a)
            al._prefetch_wire(wire_b)
        return dict(batch1=batch1, batch2=batch2, split=True,
                    seeds=(seeds_a, seeds_b), wire=(wire_a, wire_b),
                    lanes_parts=((la, ln_a), (lb, ln_b)),
                    W=W, occ_cap=OC,
                    lanes_halves=(lanes_a, lanes_b),
                    m1f=m1f, m1r=m1r, m2f=m2f, m2r=m2r,
                    len1=len1, len2=len2)

    def _pe_kwargs(self):
        cfg = self.cfg
        return dict(filter_dir=cfg.filter_dir, dir_thr=cfg.dir_thr,
                    find_orphan=cfg.find_orphan,
                    ins_mean=self.ins.mean, ins_std=self.ins.std_dev)

    def learn_pair_batch(self, batch1, batch2, handle=None):
        """learn_fragment_model over one batch (aligner_ksw2.hpp:816-885):
        score-only PE runs gate high-confidence unique pairs into the
        Welford accumulator. Returns True when the model is complete."""
        from ..align.postseed import postseed_pe
        h = handle or self.submit_pair_batch(batch1, batch2)
        h, packed = self.al._pull_seeds(h, n_lanes=4)
        runner_kw = self.al._extz_runner_kwargs(h) \
            if "packed_host" not in h else {}
        _, _, info = postseed_pe(
            self.al.index, packed, h["m1f"], h["m1r"], h["m2f"], h["m2r"],
            h["len1"], h["len2"], batch1, batch2,
            self.al.postseed_config(), liftidx=self.al.liftidx,
            finalize=False, **self._pe_kwargs(), **runner_kw)
        ok = info["learn_ok"].astype(bool)
        self.ins.add_batch(info["learn_dist"][ok].tolist())
        return self.ins.complete

    def complete_pair_batch(self, h):
        from ..align.postseed import postseed_pe
        h, packed = self.al._pull_seeds(h, n_lanes=4)
        batch1, batch2 = h["batch1"], h["batch2"]
        runner_kw = self.al._extz_runner_kwargs(h) \
            if "packed_host" not in h else {}
        with phase_timer("pe native postseed"):
            recs1, recs2, info = postseed_pe(
                self.al.index, packed, h["m1f"], h["m1r"], h["m2f"],
                h["m2r"], h["len1"], h["len2"], batch1, batch2,
                self.al.postseed_config(), liftidx=self.al.liftidx,
                finalize=True, **self._pe_kwargs(), **runner_kw)
        self.stats["pairs"] += len(batch1)
        self.stats["paired_aligned"] += int(info["aligned"].sum())
        self.stats["orphan_recovered"] += int(info["orphan_rec"].sum())
        records = []
        for r1, r2 in zip(recs1, recs2):
            records.append(r1)
            records.append(r2)
        return records

    def begin_complete_pair_sam(self, h):
        """First half of the fast PE completion: pull seeds, run the
        native PE PLAN pass, dispatch the extz score kernels (async).
        Submit the NEXT batch between begin and finish (FIFO device
        queue — the short extz kernels must not wait behind it)."""
        from ..align.postseed import postseed_pe_begin
        h, packed = self.al._pull_seeds(h, n_lanes=4)
        runner_kw = self.al._extz_runner_kwargs(h) \
            if "packed_host" not in h else {}
        with phase_timer("pe plan+dispatch"):
            st = postseed_pe_begin(
                self.al.index, packed, h["m1f"], h["m1r"], h["m2f"],
                h["m2r"], h["len1"], h["len2"], self.al.postseed_config(),
                liftidx=self.al.liftidx, finalize=True,
                **self._pe_kwargs(), **runner_kw)
        return {"st": st, "h": h}

    def finish_complete_pair_sam(self, s):
        """Second half: resolve with device scores, format the
        interleaved (m1, m2) SAM natively. Returns (sam_bytes,
        out_arrays) without building per-pair Python records."""
        from ..align.postseed import postseed_pe_finish, format_sam_pe
        h = s["h"]
        with phase_timer("pe resolve+sam"):
            o = postseed_pe_finish(s["st"])
            sam = format_sam_pe(
                self.al.index, o, h["batch1"], h["batch2"], h["m1r"],
                h["m2r"], h["len1"], h["len2"], self.al.postseed_config())
        B = len(h["batch1"])
        self.stats["pairs"] += B
        self.stats["paired_aligned"] += int(o["aligned"].sum())
        self.stats["orphan_recovered"] += int(o["orphan_rec"].sum())
        return sam, o

    def complete_pair_batch_sam(self, h):
        """begin + finish in one call (no pipelining)."""
        return self.finish_complete_pair_sam(
            self.begin_complete_pair_sam(h))

    def align_pair_batch(self, batch1, batch2):
        if self.cfg.postseed != "native":
            raise ValueError(
                f"unknown postseed path {self.cfg.postseed!r} (the "
                "approximate all-on-TPU fitting path was retired)")
        return self.complete_pair_batch(
            self.submit_pair_batch(batch1, batch2))

    # ------------------------------------------------------------------
    def _host_seeds_pe(self, batch1, batch2):
        """4-lane seeds ([m1F, m2RC, m2F, m1RC] row blocks) on host."""
        cfg = self.cfg
        B, M = len(batch1), cfg.read_pad
        m1f, m1r, len1 = self._encode(batch1, M)
        m2f, m2r, len2 = self._encode(batch2, M)
        lanes = jnp.asarray(np.concatenate([m1f, m2r, m2f, m1r]))
        lensx = jnp.asarray(np.concatenate([len1, len2, len2, len1]))
        *mems, _ctr = find_mems_batch(self.al.tables, lanes, lensx,
                                      max_mems=cfg.max_mems,
                                      min_len=cfg.min_len,
                                      work_per_read=cfg.lce_work or 96)
        seeds = populate_seeds_batch(self.al.tables, *mems,
                                     max_occs=cfg.max_occs,
                                     min_len=cfg.min_len, occs_work=16)
        seeds.pop("occ_capped", None)
        seeds.pop("work_dropped", None)
        return {k: np.asarray(v) for k, v in seeds.items()}

    def report_mems_pair_batch(self, batch1, batch2):
        """--report_mems paired arm (aligner_ksw2.hpp:1126-1180)."""
        from .memreport import mem_report_lane
        from .aligner import MATE_RC as RCBIT
        seeds = self._host_seeds_pe(batch1, batch2)
        B = len(batch1)
        records = []
        for b in range(B):
            n1, s1, q1 = batch1[b]
            n2, s2, q2 = batch2[b]
            rc1 = decode_seq(revcomp_codes(encode_seq(s1)))
            rc2 = decode_seq(revcomp_codes(encode_seq(s2)))
            self.stats["pairs"] += 1
            # lane row blocks: b=m1F, B+b=m2RC, 2B+b=m2F, 3B+b=m1RC
            recs = mem_report_lane(seeds, b, M1F, n1, s1, q1, rc1,
                                   self.al.pos_to_ref)
            recs += mem_report_lane(seeds, B + b, M2RC, n2, s2, q2, rc2,
                                    self.al.pos_to_ref)
            recs += mem_report_lane(seeds, 2 * B + b, M2F, n2, s2, q2, rc2,
                                    self.al.pos_to_ref)
            recs += mem_report_lane(seeds, 3 * B + b, M1RC, n1, s1, q1, rc1,
                                    self.al.pos_to_ref)
            records.extend(recs)
        return records

    def csv_rows_pair_batch(self, batch1, batch2):
        """--csv paired arm: one row per mate (csv_m1 / csv_m2)."""
        from .memreport import seed_csv_row
        cfg = self.cfg
        seeds = self._host_seeds_pe(batch1, batch2)
        B = len(batch1)
        rows = []
        thr = cfg.freq_thr if cfg.filter_freq else None
        for b in range(B):
            for name, rows_pair in ((batch1[b][0], (b, 3 * B + b)),
                                    (batch2[b][0], (B + b, 2 * B + b))):
                r1, r2 = rows_pair
                valid = np.concatenate([seeds["valid"][r1], seeds["valid"][r2]])
                cnt = np.concatenate([seeds["cnt"][r1], seeds["cnt"][r2]])
                occs = np.concatenate([seeds["occs"][r1], seeds["occs"][r2]])
                rows.append(seed_csv_row(name, valid, cnt, occs,
                                         self.al.seq_starts, freq_thr=thr))
        return rows
