"""Full-CPU alignment path: native seed stage + native post-seed.

The seed stage (native/cpuseeds.cpp) reimplements the index-query hot
loops on the host — MS backward search (include/ms/moni.hpp:567-624),
MEM extraction and Phi-walk occurrence enumeration with halving
(include/aligner/seed_finder.hpp:126-329) — emitting the same packed
seed format the TPU stage produces, so the identical post-seed runtime
(native/runtime.cpp) finishes the job.

Roles: the measured CPU baseline for BASELINE.md's 5x target (a
faithful multithreaded CPU MONI equivalent on the same index/data),
and a complete fallback for hosts without an accelerator
(monitpu align --engine cpu).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native.sais import _load
from ..index.alphabet import encode_seq, revcomp_codes
from .postseed import postseed_se


def _configure(lib):
    if getattr(lib, "_cpuseeds_configured", False):
        return lib
    argt = (
        [ctypes.c_void_p, ctypes.c_int64]          # text, n
        + [ctypes.c_void_p] * 10 + [ctypes.c_int64] * 2   # tables, r, Rc
        + [ctypes.c_void_p] * 3 + [ctypes.c_int64]        # phi
        + [ctypes.c_void_p] * 3 + [ctypes.c_int64]        # phiinv
        + [ctypes.c_int64] * 2                            # sa0, sa_last
        + [ctypes.c_void_p] * 2 + [ctypes.c_int64] * 2    # lanes, lens, R, M
        + [ctypes.c_int32] * 3                            # min_len, max_occs, threads
        + [ctypes.c_void_p] * 6 + [ctypes.c_int64]        # seed outs, cap
        + [ctypes.c_void_p, ctypes.c_int64]               # occ, cap
        + [ctypes.c_void_p] * 3)                          # n_seeds, n_occ, K
    lib.monitpu_cpu_seeds.restype = ctypes.c_int
    lib.monitpu_cpu_seeds.argtypes = argt
    lib.monitpu_cpu_seeds_w64.restype = ctypes.c_int
    lib.monitpu_cpu_seeds_w64.argtypes = argt
    lib._cpuseeds_configured = True
    return lib


def cpu_seeds(index, lanes, lens, min_len=25, max_occs=512, n_threads=2,
              seeds_per_lane=16, occs_per_lane=96):
    """lanes int8[R, M] oriented reads -> packed seed dict (with 'S')
    compatible with align.postseed. Buffers grow on overflow. Indexes
    built beyond 2^31 positions (int64 arrays) route to the 64-bit
    kernel — the reference's 32/64-bit binary split
    (pipeline/moni.in:195-204)."""
    lib = _configure(_load())
    lanes = np.ascontiguousarray(lanes, np.int8)
    lens = np.ascontiguousarray(lens, np.int32)
    R, M = lanes.shape
    wide = index.run_starts.dtype == np.int64
    idt = np.int64 if wide else np.int32
    entry = lib.monitpu_cpu_seeds_w64 if wide else lib.monitpu_cpu_seeds
    args_idx = [
        np.ascontiguousarray(index.text, np.int8),
        np.ascontiguousarray(index.F, np.int64),
        np.ascontiguousarray(index.run_starts, idt),
        np.ascontiguousarray(index.run_heads, np.int8),
        np.ascontiguousarray(index.block_run, idt),
        np.ascontiguousarray(index.clen_at_run, idt),
        np.ascontiguousarray(index.run_crank, idt),
        np.ascontiguousarray(index.thr_cnt_run, idt),
        np.ascontiguousarray(index.thr_pos_run, idt),
        np.ascontiguousarray(index.csamples_start, idt),
        np.ascontiguousarray(index.csamples_last, idt),
        np.ascontiguousarray(index.phi_z, idt),
        np.ascontiguousarray(index.phi_w, idt),
        np.ascontiguousarray(index.phi_wl, idt),
        np.ascontiguousarray(index.phiinv_z, idt),
        np.ascontiguousarray(index.phiinv_w, idt),
        np.ascontiguousarray(index.phiinv_wl, idt),
    ]
    (text, F, run_starts, run_heads, block_run, clen, crank, tcnt, tpos,
     cs, cl, pz, pw, pwl, vz, vw, vwl) = args_idx
    seed_cap = seeds_per_lane * R
    occ_cap = occs_per_lane * R
    while True:
        row = np.zeros(seed_cap, np.int32)
        slot = np.zeros(seed_cap, np.int32)
        slen = np.zeros(seed_cap, np.int32)
        sidx = np.zeros(seed_cap, np.int32)
        scnt = np.zeros(seed_cap, np.int32)
        soff = np.zeros(seed_cap, np.int32)
        occ = np.zeros(occ_cap, np.int64)
        n_seeds = ctypes.c_int64()
        n_occ = ctypes.c_int64()
        K = ctypes.c_int64()
        ptr = lambda a: a.ctypes.data
        rc = entry(
            ptr(text), ctypes.c_int64(index.n), ptr(F),
            ptr(run_starts), ptr(run_heads), ptr(block_run), ptr(clen),
            ptr(crank), ptr(tcnt), ptr(tpos), ptr(cs), ptr(cl),
            ctypes.c_int64(index.r),
            ctypes.c_int64(index.csamples_start.shape[1]),
            ptr(pz), ptr(pw), ptr(pwl), ctypes.c_int64(pz.size),
            ptr(vz), ptr(vw), ptr(vwl), ctypes.c_int64(vz.size),
            ctypes.c_int64(index.sa0), ctypes.c_int64(index.sa_last),
            ptr(lanes), ptr(lens), ctypes.c_int64(R), ctypes.c_int64(M),
            min_len, max_occs, n_threads,
            ptr(row), ptr(slot), ptr(slen), ptr(sidx), ptr(scnt),
            ptr(soff), ctypes.c_int64(seed_cap), ptr(occ),
            ctypes.c_int64(occ_cap),
            ctypes.byref(n_seeds), ctypes.byref(n_occ), ctypes.byref(K))
        if rc != 0:
            raise RuntimeError(f"monitpu_cpu_seeds rc={rc}")
        if n_seeds.value > seed_cap or n_occ.value > occ_cap:
            seed_cap *= 2
            occ_cap *= 2
            continue
        return {"row": row, "slot": slot, "len": slen, "idx": sidx,
                "cnt": scnt, "off": soff, "occ": occ,
                "n_valid": np.int32(n_seeds.value),
                "n_occ": np.int32(n_occ.value),
                "S": 3 * int(K.value)}


class CpuAligner:
    """Drop-in CPU engine with the Aligner/PairedAligner batch surface."""

    def __init__(self, index, config=None, liftidx=None):
        from .aligner import AlignConfig
        self.index = index
        self.cfg = config or AlignConfig()
        self.liftidx = liftidx
        self.stats = {"processed": 0, "aligned": 0}

    def _encode(self, reads, M):
        B = len(reads)
        fwd = np.zeros((B, M), np.int8)
        rc = np.zeros((B, M), np.int8)
        lens = np.zeros(B, np.int32)
        for b, (_, seq, _) in enumerate(reads):
            codes = encode_seq(seq[:M])
            fwd[b, :len(codes)] = codes
            rc[b, :len(codes)] = revcomp_codes(codes)
            lens[b] = len(codes)
        return fwd, rc, lens

    def _postseed_cfg(self):
        from .postseed import config_from_align
        return config_from_align(self.cfg)

    def align_batch(self, reads):
        cfg = self.cfg
        fwd, rc, lens = self._encode(reads, cfg.read_pad)
        lanes = np.concatenate([fwd, rc])
        packed = cpu_seeds(self.index, lanes,
                           np.concatenate([lens, lens]),
                           min_len=cfg.min_len, max_occs=cfg.max_occs,
                           n_threads=cfg.postseed_threads)
        records, _ = postseed_se(self.index, packed, fwd, rc, lens,
                                 reads, self._postseed_cfg(),
                                 liftidx=self.liftidx)
        self.stats["processed"] += len(records)
        self.stats["aligned"] += sum(1 for r in records
                                     if not (r.flag & 4))
        return records
