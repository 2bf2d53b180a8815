"""ctypes binding for the native extz-semantics kernel (native/ksw2.cpp).

Reproduces the ksw_extz2_sse contract as the reference uses it
(include/aligner/aligner_ksw2.hpp:2812/:2844 extension with
KSW_EZ_EXTZ_ONLY|KSW_EZ_RIGHT, :2965 global with KSW_EZ_RIGHT,
score-only passes with KSW_EZ_SCORE_ONLY). Band/zdrop/end_bonus are
no-ops under the reference's configuration (config_t:112-115: w=-1,
zdrop=-1; end_bonus only gates zdrop breaks) and are omitted.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native.sais import _load

SCORE_ONLY = 1   # KSW_EZ_SCORE_ONLY
EXTZ_ONLY = 2    # KSW_EZ_EXTZ_ONLY: traceback from the mqe cell

_OPS = "MID"


def _configure(lib):
    if getattr(lib, "_extz_configured", False):
        return lib
    c = ctypes
    lib.monitpu_extz.restype = c.c_int
    lib.monitpu_extz.argtypes = [
        c.c_void_p, c.c_int32, c.c_void_p, c.c_int32,
        c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32,
        c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_int64,
    ]
    lib.monitpu_extz_batch.restype = c.c_int
    lib.monitpu_extz_batch.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64,
        c.c_void_p, c.c_void_p, c.c_int64,
        c.c_void_p, c.c_int64,
        c.c_int32, c.c_int32, c.c_int32, c.c_int32,
        c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_int64, c.c_int32,
    ]
    lib._extz_configured = True
    return lib


def extz(query, target, smatch=2, smismatch=4, gapo=4, gape=2,
         flags=0, cigar_cap=1024):
    """One extension DP. query/target: int8 code arrays (0=SEP, 1..4=ACGT,
    5=N). Returns dict(score, mqe, mqe_t, cigar=[(op, len), ...]) with op
    in 'MID'; cigar is empty under SCORE_ONLY."""
    lib = _configure(_load())
    q = np.ascontiguousarray(query, dtype=np.int8)
    t = np.ascontiguousarray(target, dtype=np.int8)
    score = ctypes.c_int32()
    mqe = ctypes.c_int32()
    mqe_t = ctypes.c_int32()
    ncig = ctypes.c_int32()
    cig = np.zeros(cigar_cap, np.uint32)
    rc = lib.monitpu_extz(
        q.ctypes.data, ctypes.c_int32(q.size),
        t.ctypes.data, ctypes.c_int32(t.size),
        smatch, smismatch, gapo, gape, flags,
        ctypes.byref(score), ctypes.byref(mqe), ctypes.byref(mqe_t),
        cig.ctypes.data, ctypes.byref(ncig), ctypes.c_int64(cigar_cap))
    if rc != 0:
        raise RuntimeError(f"monitpu_extz rc={rc}")
    ops = [(_OPS[int(w) & 0xF], int(w) >> 4) for w in cig[:ncig.value]]
    return {"score": int(score.value), "mqe": int(mqe.value),
            "mqe_t": int(mqe_t.value), "cigar": ops}


def extz_batch(queries, qlens, targets, tlens, flags, active=None,
               smatch=2, smismatch=4, gapo=4, gape=2, cigar_cap=512,
               n_threads=4):
    """Batched lanes (shared strides). Returns dict(score, mqe, mqe_t
    int32[L], cigars list of op-lists or None for inactive lanes)."""
    lib = _configure(_load())
    q = np.ascontiguousarray(queries, dtype=np.int8)
    t = np.ascontiguousarray(targets, dtype=np.int8)
    qlens = np.ascontiguousarray(qlens, dtype=np.int32)
    tlens = np.ascontiguousarray(tlens, dtype=np.int32)
    flags = np.ascontiguousarray(flags, dtype=np.int32)
    L = q.shape[0]
    if active is None:
        active = np.ones(L, np.uint8)
    active = np.ascontiguousarray(active, dtype=np.uint8)
    score = np.zeros(L, np.int32)
    mqe = np.zeros(L, np.int32)
    mqe_t = np.zeros(L, np.int32)
    cig = np.zeros((L, cigar_cap), np.uint32)
    ncig = np.zeros(L, np.int32)
    rc = lib.monitpu_extz_batch(
        q.ctypes.data, qlens.ctypes.data, ctypes.c_int64(q.shape[1]),
        t.ctypes.data, tlens.ctypes.data, ctypes.c_int64(t.shape[1]),
        active.ctypes.data, ctypes.c_int64(L),
        smatch, smismatch, gapo, gape,
        flags.ctypes.data,
        score.ctypes.data, mqe.ctypes.data, mqe_t.ctypes.data,
        cig.ctypes.data, ncig.ctypes.data, ctypes.c_int64(cigar_cap),
        ctypes.c_int32(n_threads))
    if rc != 0:
        raise RuntimeError(f"monitpu_extz_batch rc={rc}")
    cigars = []
    for l in range(L):
        if not active[l]:
            cigars.append(None)
            continue
        cigars.append([(_OPS[int(w) & 0xF], int(w) >> 4)
                       for w in cig[l, :ncig[l]]])
    return {"score": score, "mqe": mqe, "mqe_t": mqe_t, "cigars": cigars}
