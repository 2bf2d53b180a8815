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

The legacy all-on-TPU path (postseed="device") remains below:
paired chains scored with fitting alignments, documented divergences:
- direction-filter averages use the original MEMs only (the reference
  accidentally includes split half-seeds in the dir2 average);
- chain parts are scored by fitting alignment over the part's window
  (dominates the reference's piecewise score, see ops/sw.py docstring).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..index.alphabet import encode_seq, revcomp_codes, decode_seq
from ..ops.ms import extract_windows, find_mems_batch
from ..ops.occs import populate_seeds_batch
from ..ops.chain import find_chains_batch
from ..ops.sw import sw_fit_banded
from .aligner import Aligner, AlignConfig, _host_finalize, MATE_RC
from .mapq import compute_mapq_se_bwa, compute_mapq_pe_bwa
from .sam import (SamRecord, SAM_PAIRED, SAM_MAPPED_PAIRED, SAM_UNMAPPED,
                  SAM_MATE_UNMAPPED, SAM_REVERSED, SAM_MATE_REVERSED,
                  SAM_FIRST_IN_PAIR, SAM_SECOND_IN_PAIR,
                  cigar_ops_to_string)
from ..utils.timers import phase_timer

M1F, M2F, M1RC, M2RC = 0, 1, 2, 3  # MATE_1|MATE_F etc. (mems.hpp:26-29)
NEGBIG = -(2**27)


@functools.partial(jax.jit, static_argnames=("cfg", "B", "K"))
def _pe_merge_filter_chain(tables, seeds, len1, len2, B, K, cfg: AlignConfig):
    """Merge the 4 per-pair seed lanes, direction filter, freq filter,
    chain. Lane order: [m1F, m2RC, m2F, m1RC] (blocks of B)."""
    def blk(v):
        return jnp.concatenate([v[:B], v[B:2 * B], v[2 * B:3 * B],
                                v[3 * B:]], axis=1)

    seeds = {k: blk(v) for k, v in seeds.items()}
    S = seeds["len"].shape[1]
    SB = S // 4
    mate_codes = [M1F, M2RC, M2F, M1RC]
    mate = jnp.concatenate(
        [jnp.full((B, SB), c, jnp.int32) for c in mate_codes], axis=1)
    # rpos offsets (aligner_ksw2.hpp:1106-1109): m2RC += |m1|, m1RC += |m2|
    off = jnp.concatenate(
        [jnp.zeros((B, SB), jnp.int32),
         jnp.broadcast_to(len1[:, None], (B, SB)),
         jnp.zeros((B, SB), jnp.int32),
         jnp.broadcast_to(len2[:, None], (B, SB))], axis=1)
    seeds["rpos"] = seeds["idx"] + seeds["len"] - 1 + off

    # direction filter over original MEMs (slot % (3K) < K)
    slot = jnp.arange(S)[None, :]
    is_parent = (slot % (3 * K)) < K
    dir1 = slot < 2 * SB
    pv = seeds["valid"] & is_parent
    def avg(mask):
        m = pv & mask
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1)
        return jnp.sum(jnp.where(m, seeds["len"], 0), axis=1) / cnt, \
            jnp.sum(m, axis=1) > 0
    a1, has1 = avg(dir1)
    a2, has2 = avg(~dir1)
    drop2 = (a1 > a2) & ((a1 - a2) > cfg.dir_thr) & has1
    drop1 = (a2 > a1) & ((a2 - a1) > cfg.dir_thr) & has2
    keep = jnp.where(dir1, ~drop1[:, None], ~drop2[:, None])
    seeds["valid"] = seeds["valid"] & keep

    if cfg.filter_freq:
        cnt = jnp.where(seeds["valid"], seeds["cnt"], 0)
        total = jnp.maximum(jnp.sum(cnt, axis=1, keepdims=True), 1)
        fdrop = cnt.astype(jnp.float32) > cfg.freq_thr * total.astype(
            jnp.float32)
        seeds["valid"] = seeds["valid"] & ~fdrop

    return find_chains_batch(seeds, mate, cfg.chain, cfg.max_anchors)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pe_score_chains(tables, anchors, chains, m1f, m1r, m2f, m2r,
                     len1, len2, cfg: AlignConfig):
    """Score both mate parts of every top chain with fitting alignments."""
    B, M = m1f.shape
    C = chains["score"].shape[1]
    L = chains["anchors"].shape[2]
    A = cfg.max_anchors
    ltr = chains["anchors"]
    valid_pos = ltr >= 0
    am3 = jnp.broadcast_to(anchors["mate"][:, None, :], (B, C, A))
    gmate = jnp.take_along_axis(am3, jnp.clip(ltr, 0, A - 1), axis=2)
    is_m1 = (gmate & 1) == 0  # MATE_2 bit (mems.hpp:27)

    def first_anchor(part_mask):
        m = part_mask & valid_pos
        has = jnp.any(m, axis=2)
        fi = jnp.argmax(m, axis=2)  # first True along L
        a = jnp.take_along_axis(ltr, fi[:, :, None], axis=2)[:, :, 0]
        return has, jnp.clip(a, 0, A - 1)

    has1, a1 = first_anchor(is_m1)
    has2, a2 = first_anchor(~is_m1)

    n = tables["n"]
    text = tables["text"]

    def window(a):
        fpos = jnp.take_along_axis(anchors["pos"], a, axis=1)
        fidx = jnp.take_along_axis(anchors["idx"], a, axis=1)
        return jnp.clip(fpos - fidx - cfg.margin, 0, n - 1)

    w1, w2 = window(a1), window(a2)
    # direction 1: chain.mate in {M1F, M2RC} (aligner_ksw2.hpp:1283-1288)
    dir1 = (chains["mate"] == M1F) | (chains["mate"] == M2RC)

    q1 = jnp.where(dir1[:, :, None], m1f[:, None, :], m1r[:, None, :])
    q2 = jnp.where(dir1[:, :, None], m2r[:, None, :], m2f[:, None, :])
    ql1 = jnp.broadcast_to(len1[:, None], (B, C))
    ql2 = jnp.broadcast_to(len2[:, None], (B, C))

    q = jnp.concatenate([q1.reshape(B * C, M), q2.reshape(B * C, M)], axis=0)
    ql = jnp.concatenate([ql1.reshape(-1), ql2.reshape(-1)], axis=0)
    ws = jnp.concatenate([w1.reshape(-1), w2.reshape(-1)], axis=0)
    Wt = -(-(M + 2 * cfg.margin + 4) // 4) * 4
    target = extract_windows(tables, ws, Wt)
    tlen = jnp.clip(n - ws, 0, Wt)

    out = sw_fit_banded(q, ql, target, tlen, cfg.sw, band_w=cfg.margin)
    s = out["score"].reshape(2, B, C)
    te = out["tend"].reshape(2, B, C)
    cv = chains["valid"]
    s1 = jnp.where(cv & has1, s[0], NEGBIG)
    s2 = jnp.where(cv & has2, s[1], NEGBIG)
    return {"s1": s1, "s2": s2, "tend1": te[0], "tend2": te[1],
            "win1": w1, "win2": w2, "has1": has1 & cv, "has2": has2 & cv,
            "dir1": dir1, "valid": cv}


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


def insert_penalty(dist, mean, std_dev, smatch):
    if std_dev <= 0.0:
        return 0
    ns = (dist - mean) / std_dev
    return int(.721 * math.log(2. * math.erfc(abs(ns) * (2 ** -0.5)))
               * smatch + .499)


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
        B = len(batch)
        fwd, rc, lens = encode_batch([r[1] for r in batch], M)
        fc = [fwd[b, :lens[b]] for b in range(B)]
        rcc = [rc[b, :lens[b]] for b in range(B)]
        return fwd, rc, lens, fc, rcc

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
        m1f, m1r, len1, _, _ = self._encode(batch1, M)
        m2f, m2r, len2, _, _ = self._encode(batch2, M)
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
                seeds, wire = al._seed_stage_sharded(
                    [m1f, m2r, m2f, m1r], [len1, len2, len2, len1])
            return dict(batch1=batch1, batch2=batch2, seeds=seeds,
                        wire=wire, sharded=True,
                        m1f=m1f, m1r=m1r, m2f=m2f, m2r=m2r,
                        len1=len1, len2=len2)
        max_mems, work = al.seed_pools()
        with phase_timer("pe device dispatch"):
            lanes = al.put_batch(np.concatenate([m1f, m2r, m2f, m1r]))
            lensx = al.put_batch(np.concatenate([len1, len2, len2, len1]))
            *mems, mctr = find_mems_batch(al.tables, lanes, lensx,
                                          max_mems=max_mems,
                                          min_len=cfg.min_len,
                                          work_per_read=work)
            seeds = populate_seeds_batch(al.tables, *mems,
                                         max_occs=cfg.max_occs,
                                         min_len=cfg.min_len)
            ctrs = jnp.stack([mctr["lce_dropped"], mctr["mem_dropped"],
                              seeds.pop("occ_capped")])
            W, OC = 2 * cfg.pack_seeds_per_read * B, \
                2 * cfg.pack_occs_per_read * B
            wire = pack_seeds_wire(seeds, W=W, occ_cap=OC, ctrs=ctrs)
            al._prefetch_wire(wire)
        return dict(batch1=batch1, batch2=batch2, seeds=seeds,
                    wire=wire, W=W, occ_cap=OC,
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
        _, _, info = postseed_pe(
            self.al.index, packed, h["m1f"], h["m1r"], h["m2f"], h["m2r"],
            h["len1"], h["len2"], batch1, batch2,
            self.al.postseed_config(), liftidx=self.al.liftidx,
            finalize=False, **self._pe_kwargs())
        ok = info["learn_ok"].astype(bool)
        self.ins.add_batch(info["learn_dist"][ok].tolist())
        return self.ins.complete

    def complete_pair_batch(self, h):
        from ..align.postseed import postseed_pe
        h, packed = self.al._pull_seeds(h, n_lanes=4)
        batch1, batch2 = h["batch1"], h["batch2"]
        with phase_timer("pe native postseed"):
            recs1, recs2, info = postseed_pe(
                self.al.index, packed, h["m1f"], h["m1r"], h["m2f"],
                h["m2r"], h["len1"], h["len2"], batch1, batch2,
                self.al.postseed_config(), liftidx=self.al.liftidx,
                finalize=True, **self._pe_kwargs())
        self.stats["pairs"] += len(batch1)
        self.stats["paired_aligned"] += int(info["aligned"].sum())
        self.stats["orphan_recovered"] += int(info["orphan_rec"].sum())
        records = []
        for r1, r2 in zip(recs1, recs2):
            records.append(r1)
            records.append(r2)
        return records

    def align_pair_batch(self, batch1, batch2):
        if self.cfg.postseed == "native":
            return self.complete_pair_batch(
                self.submit_pair_batch(batch1, batch2))
        return self._align_pair_batch_device(batch1, batch2)

    def _align_pair_batch_device(self, batch1, batch2):
        cfg = self.cfg
        al = self.al
        B = len(batch1)
        M = cfg.read_pad
        m1f, m1r, len1, m1codes, m1rcodes = self._encode(batch1, M)
        m2f, m2r, len2, m2codes, m2rcodes = self._encode(batch2, M)

        with phase_timer("pe device pipeline"):
            lanes = al.put_batch(np.concatenate([m1f, m2r, m2f, m1r]))
            lensx = al.put_batch(np.concatenate([len1, len2, len2, len1]))
            mp, ml, mi, mc, _ctr = find_mems_batch(
                self.al.tables, lanes, lensx, max_mems=cfg.max_mems,
                min_len=cfg.min_len, work_per_read=cfg.lce_work or 96)
            seeds = populate_seeds_batch(
                self.al.tables, mp, ml, mi, mc, max_occs=cfg.max_occs,
                min_len=cfg.min_len)
            seeds.pop("occ_capped", None)
            anchors, chains = _pe_merge_filter_chain(
                self.al.tables, seeds, jnp.asarray(len1), jnp.asarray(len2),
                B, cfg.max_mems, cfg)
            dev = _pe_score_chains(
                self.al.tables, anchors, chains, jnp.asarray(m1f),
                jnp.asarray(m1r), jnp.asarray(m2f), jnp.asarray(m2r),
                jnp.asarray(len1), jnp.asarray(len2), cfg)
            host = {k: np.asarray(v) for k, v in dev.items()}

        mean, std = self.ins.mean, self.ins.std_dev

        # ---- host selection: pair scores + region dedup ----
        with phase_timer("pe selection"):
            sel = self._select_pairs(B, host, len1, len2, mean, std)

        # ---- learn insert model from unique best pairs ----
        if not self.ins.complete:
            dists = []
            for best, *_ in sel:
                if len(best) and best[0][0] > 0 and best[0][4]:
                    if len(best) < 2 or best[0][0] > best[1][0]:
                        dists.append(best[0][5])
            self.ins.add_batch(dists)

        # ---- finalize winners ----
        return self._finalize(batch1, batch2, sel, host,
                              m1f, m1r, m2f, m2r, len1, len2,
                              m1codes, m1rcodes, m2codes, m2rcodes)

    # ------------------------------------------------------------------
    def _host_seeds_pe(self, batch1, batch2):
        """4-lane seeds ([m1F, m2RC, m2F, m1RC] row blocks) on host."""
        cfg = self.cfg
        B, M = len(batch1), cfg.read_pad
        m1f, m1r, len1, _, _ = self._encode(batch1, M)
        m2f, m2r, len2, _, _ = self._encode(batch2, M)
        lanes = jnp.asarray(np.concatenate([m1f, m2r, m2f, m1r]))
        lensx = jnp.asarray(np.concatenate([len1, len2, len2, len1]))
        *mems, _ctr = find_mems_batch(self.al.tables, lanes, lensx,
                                      max_mems=cfg.max_mems,
                                      min_len=cfg.min_len,
                                      work_per_read=cfg.lce_work or 96)
        seeds = populate_seeds_batch(self.al.tables, *mems,
                                     max_occs=cfg.max_occs,
                                     min_len=cfg.min_len)
        seeds.pop("occ_capped", None)
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

    # ------------------------------------------------------------------
    def _select_pairs(self, B, host, len1, len2, mean, std):
        cfg = self.cfg
        s1, s2 = host["s1"], host["s2"]
        sel = []
        for b in range(B):
            min1 = int(20 + 8 * math.log(max(int(len1[b]), 2)))
            min2 = int(20 + 8 * math.log(max(int(len2[b]), 2)))
            tots = []
            C = s1.shape[1]
            for c in range(C):
                if not host["valid"][b, c]:
                    continue
                p1 = int(host["win1"][b, c]) + int(host["tend1"][b, c]) - \
                    int(len1[b]) + 1
                p2 = int(host["win2"][b, c]) + int(host["tend2"][b, c]) - \
                    int(len2[b]) + 1
                v1 = bool(host["has1"][b, c]) and s1[b, c] > NEGBIG
                v2 = bool(host["has2"][b, c]) and s2[b, c] > NEGBIG
                if v1 and v2:
                    d = abs(p2 - (p1 + int(len1[b])))
                    tot = int(s1[b, c]) + int(s2[b, c]) + \
                        insert_penalty(d, mean, std, cfg.sw.smatch)
                    tot = max(tot, 0)
                elif v1:
                    tot, d = int(s1[b, c]), 0
                elif v2:
                    tot, d = int(s2[b, c]), 0
                else:
                    continue
                tots.append((tot, c, p1 if v1 else -1, p2 if v2 else -1,
                             v1 and v2, d))
            tots.sort(key=lambda t: -t[0])
            best = []       # (tot, c, p1, p2, paired, dist)
            regions = []
            for tot, c, p1, p2, paired, d in tots:
                l1 = self.al.lift(p1) if p1 >= 0 else -1
                l2 = self.al.lift(p2) if p2 >= 0 else -1
                if any(abs(r1 - l1) < cfg.region_dist and
                       abs(r2 - l2) < cfg.region_dist
                       for r1, r2 in regions):
                    continue
                regions.append((l1, l2))
                best.append((tot, c, p1, p2, paired, d))
                if len(best) >= cfg.check_k:
                    break
            sel.append((best, min1, min2))
        return sel

    # ------------------------------------------------------------------
    def _finalize(self, batch1, batch2, sel, host,
                  m1f, m1r, m2f, m2r, len1, len2,
                  m1codes, m1rcodes, m2codes, m2rcodes):
        cfg = self.cfg
        al = self.al
        B = len(batch1)
        M = cfg.read_pad

        # lanes [0, B) = mate1, [B, 2B) = mate2
        q = np.zeros((2 * B, M), np.int8)
        ql = np.concatenate([len1, len2]).astype(np.int32)
        ws = np.zeros(2 * B, np.int32)
        te = np.zeros(2 * B, np.int32)
        exp = np.zeros(2 * B, np.int32)
        active = np.zeros(2 * B, bool)
        windir = np.zeros(B, bool)
        for b, (best, min1, min2) in enumerate(sel):
            if not best:
                continue
            tot, c, p1, p2, paired, d = best[0]
            gate = (min1 + min2) if paired else min(min1, min2)
            if tot < gate:
                continue
            dir1 = bool(host["dir1"][b, c])
            windir[b] = dir1
            if host["has1"][b, c]:
                active[b] = True
                q[b] = m1f[b] if dir1 else m1r[b]
                ws[b] = host["win1"][b, c]
                te[b] = host["tend1"][b, c]
                exp[b] = host["s1"][b, c]
            if host["has2"][b, c]:
                active[B + b] = True
                q[B + b] = m2r[b] if dir1 else m2f[b]
                ws[B + b] = host["win2"][b, c]
                te[B + b] = host["tend2"][b, c]
                exp[B + b] = host["s2"][b, c]

        with phase_timer("pe native finalize"):
            fin, _ = _host_finalize(al.index, q, ql, ws, active, cfg,
                                    tends=te, expected=exp)

        # unified per-mate results
        res = [dict(ok=False) for _ in range(2 * B)]
        for lane in range(2 * B):
            b = lane % B
            gate = sel[b][1] if lane < B else sel[b][2]
            if active[lane] and fin["ops"][lane] and \
                    fin["score"][lane] >= gate:
                res[lane] = dict(
                    ok=True, ops=fin["ops"][lane],
                    pos=int(ws[lane]) + int(fin["tstart"][lane]),
                    score=int(fin["score"][lane]), md=fin["md"][lane],
                    nm=int(fin["nm"][lane]), rlen=int(fin["rlen"][lane]))

        # ---- orphan recovery (aligner_ksw2.hpp:1536-1658) ----
        with phase_timer("pe orphan"):
            self._recover_orphans(B, res, windir, sel,
                                  m1f, m1r, m2f, m2r, len1, len2)

        # ---- SAM assembly ----
        records = []
        for b in range(B):
            name1, seq1, qual1 = batch1[b]
            name2, seq2, qual2 = batch2[b]
            qname = name1[:-2] if name1.endswith(("/1", "/2")) else name1
            best, min1, min2 = sel[b]
            r1 = SamRecord(qname=qname, seq=seq1, qual=qual1 or "*")
            r2 = SamRecord(qname=qname, seq=seq2, qual=qual2 or "*")
            r1.rnext = r2.rnext = "="
            self.stats["pairs"] += 1
            dir1 = bool(windir[b])
            rev1, rev2 = (not dir1), dir1

            self._fill_mate(r1, res[b], rev1, m1codes[b], m1rcodes[b],
                            qual1)
            self._fill_mate(r2, res[B + b], rev2, m2codes[b], m2rcodes[b],
                            qual2)
            self._pair_flags_and_tlen(
                r1, r2, res[b]["ok"], res[B + b]["ok"], dir1,
                int(len1[b]), int(len2[b]), best, min1, min2)
            if res[b]["ok"] or res[B + b]["ok"]:
                self.stats["paired_aligned"] += 1
            records.append(r1)
            records.append(r2)
        return records

    def _fill_mate(self, rec, r, reverse, fcodes, rcodes, qual):
        if not r["ok"]:
            return
        codes = rcodes if reverse else fcodes
        ok = self.al.set_alignment_fields(
            rec, r["pos"], r["ops"], r["md"], r["nm"], r["rlen"], codes)
        if not ok:
            r["ok"] = False
            return
        rec.asc = r["score"]
        if reverse:
            rec.seq = decode_seq(rcodes)
            rec.qual = qual[::-1] if qual else "*"

    def _pair_flags_and_tlen(self, r1, r2, ok1, ok2, dir1, l1, l2,
                             best, min1, min2):
        cfg = self.cfg
        score2 = best[1][0] if len(best) > 1 else 0
        sub_n = max(len(best) - 1, 0)
        if ok1 and ok2:
            r1.flag = r2.flag = SAM_PAIRED | SAM_MAPPED_PAIRED
            if dir1:
                r1.flag |= SAM_MATE_REVERSED | SAM_FIRST_IN_PAIR
                r2.flag |= SAM_REVERSED | SAM_SECOND_IN_PAIR
            else:
                r1.flag |= SAM_REVERSED | SAM_FIRST_IN_PAIR
                r2.flag |= SAM_MATE_REVERSED | SAM_SECOND_IN_PAIR
            r1.pnext, r2.pnext = r2.pos, r1.pos
            if r2.pos > r1.pos:
                tlen = (r2.pos + l2) - r1.pos
                r1.tlen, r2.tlen = tlen, -tlen
            else:
                tlen = (r1.pos + l1) - r2.pos
                r1.tlen, r2.tlen = -tlen, tlen
            d = abs((r2.pos) - (r1.pos + l1))
            tot = max(r1.asc + r2.asc + insert_penalty(
                d, self.ins.mean, self.ins.std_dev, cfg.sw.smatch), 0)
            m1 = compute_mapq_se_bwa(r1.asc, 0, r1.rlen, l1, cfg.min_len,
                                     cfg.sw.smatch, cfg.sw.smismatch,
                                     sub_n=sub_n)
            m2 = compute_mapq_se_bwa(r2.asc, 0, r2.rlen, l2, cfg.min_len,
                                     cfg.sw.smatch, cfg.sw.smismatch,
                                     sub_n=sub_n)
            _, m1, m2 = compute_mapq_pe_bwa(
                tot, score2, 0, cfg.sw.smatch, sub_n, 0.0, 0.0,
                r1.asc, r2.asc, 0, 0, m1, m2)
            r1.mapq, r2.mapq = m1, m2
            r1.zs = r2.zs = score2
            r1.asc = r2.asc = tot
        elif ok1 or ok2:
            mapped, unmapped = (r1, r2) if ok1 else (r2, r1)
            lm = l1 if ok1 else l2
            rev = (not dir1) if ok1 else dir1
            mapped.mapq = compute_mapq_se_bwa(
                mapped.asc, 0, mapped.rlen, lm, cfg.min_len, cfg.sw.smatch,
                cfg.sw.smismatch, sub_n=sub_n)
            mapped.flag = SAM_PAIRED | SAM_MATE_UNMAPPED | (
                SAM_FIRST_IN_PAIR if ok1 else SAM_SECOND_IN_PAIR)
            if rev:
                mapped.flag |= SAM_REVERSED
            unmapped.flag = SAM_PAIRED | SAM_UNMAPPED | (
                SAM_SECOND_IN_PAIR if ok1 else SAM_FIRST_IN_PAIR)
            # GATK unmapped-mate convention (aligner_ksw2.hpp:2263-2269)
            unmapped.rname = mapped.rname
            unmapped.pos = mapped.pos
            unmapped.mapq = mapped.mapq
            unmapped.cigar = "*"
            unmapped.pnext = mapped.pnext = mapped.pos
            unmapped.tlen = mapped.tlen = 0
        else:
            r1.flag = r2.flag = SAM_PAIRED | SAM_UNMAPPED | SAM_MATE_UNMAPPED
            r1.rnext = r2.rnext = "*"

    # ------------------------------------------------------------------
    def _recover_orphans(self, B, res, windir, sel,
                         m1f, m1r, m2f, m2r, len1, len2):
        """One mate mapped, other not: fitting-align the missing mate in
        the insert window around the mapped one (mean + 4 sigma,
        aligner_ksw2.hpp:2566-2711)."""
        cfg = self.cfg
        if not cfg.find_orphan or self.ins.std_dev <= 0.0:
            return
        OW = min(int(self.ins.mean + 4 * self.ins.std_dev) + cfg.read_pad,
                 cfg.orphan_window)
        lanes, qs, qlens, wss = [], [], [], []
        n = self.al.index.n
        for b in range(B):
            ok1, ok2 = res[b]["ok"], res[B + b]["ok"]
            if ok1 == ok2:
                continue
            dir1 = bool(windir[b])
            if ok1:  # find mate2
                p1 = res[b]["pos"]
                # FR geometry: in dir1, m2(rc) lies downstream of m1;
                # in dir2, m2(f) lies upstream of m1(rc) end
                w = p1 if dir1 else max(0, p1 + int(len1[b]) - OW)
                lanes.append(B + b)
                qs.append(m2r[b] if dir1 else m2f[b])
                qlens.append(int(len2[b]))
            else:    # find mate1
                p2 = res[B + b]["pos"]
                w = max(0, p2 + int(len2[b]) - OW) if dir1 else p2
                lanes.append(b)
                qs.append(m1f[b] if dir1 else m1r[b])
                qlens.append(int(len1[b]))
            wss.append(min(w, n - 1))
        if not lanes:
            return
        fin, _ = _host_finalize(
            self.al.index, np.asarray(qs, np.int8),
            np.asarray(qlens, np.int32), np.asarray(wss, np.int32),
            np.ones(len(lanes), bool), cfg, window=OW)
        for k, lane in enumerate(lanes):
            b = lane % B
            gate = sel[b][1] if lane < B else sel[b][2]
            if fin["ops"][k] and fin["score"][k] >= gate:
                self.stats["orphan_recovered"] += 1
                res[lane] = dict(
                    ok=True, ops=fin["ops"][k],
                    pos=int(wss[k]) + int(fin["tstart"][k]),
                    score=int(fin["score"][k]), md=fin["md"][k],
                    nm=int(fin["nm"][k]), rlen=int(fin["rlen"][k]))
