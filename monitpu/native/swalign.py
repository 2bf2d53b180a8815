"""ctypes bindings for the native fitting-alignment finalize pass."""

from __future__ import annotations

import ctypes

import numpy as np

from .sais import _load

_OPS = "MID"


def fit_align_batch(queries, qlens, targets, tlens, active,
                    smatch=2, smismatch=4, gapo=4, gape=2,
                    n_threads=2, cigar_cap=640, md_cap=1024,
                    tends=None, expected=None, band_w=48):
    """Batched host fitting alignment with traceback.

    queries int8[L, Q], targets int8[L, T] (code alphabet), qlens/tlens
    int32[L], active bool[L]. When tends/expected (the device score
    pass's optimal end column and score per lane) are given, a banded
    DP around the known end diagonal is tried first and falls back to
    the full DP on any disagreement. Returns dict with per-lane score,
    tstart, rlen, nm, and decoded cigar op-lists + MD strings (None for
    inactive lanes)."""
    lib = _load()
    if not hasattr(lib.monitpu_fit_align_batch, "_configured"):
        c = ctypes
        lib.monitpu_fit_align_batch.restype = c.c_int
        lib.monitpu_fit_align_batch.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64,      # queries, qlens, qstride
            c.c_void_p, c.c_void_p, c.c_int64,      # targets, tlens, tstride
            c.c_void_p, c.c_int64,                  # active, n_lanes
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,  # scoring
            c.c_void_p, c.c_void_p, c.c_int32,      # tends, expected, band_w
            c.c_void_p, c.c_void_p, c.c_void_p,     # score, tstart, rlen
            c.c_void_p, c.c_void_p, c.c_int64,      # cigar, ncigar, cap
            c.c_void_p, c.c_void_p, c.c_int64,      # md, mdlen, cap
            c.c_void_p, c.c_int32,                  # nm, threads
        ]
        lib.monitpu_fit_align_batch._configured = True

    queries = np.ascontiguousarray(queries, dtype=np.int8)
    targets = np.ascontiguousarray(targets, dtype=np.int8)
    qlens = np.ascontiguousarray(qlens, dtype=np.int32)
    tlens = np.ascontiguousarray(tlens, dtype=np.int32)
    active = np.ascontiguousarray(active, dtype=np.uint8)
    if tends is not None:
        tends = np.ascontiguousarray(tends, dtype=np.int32)
    if expected is not None:
        expected = np.ascontiguousarray(expected, dtype=np.int32)
    L = queries.shape[0]

    score = np.zeros(L, np.int32)
    tstart = np.zeros(L, np.int32)
    rlen = np.zeros(L, np.int32)
    cigar = np.zeros((L, cigar_cap), np.uint32)
    ncigar = np.zeros(L, np.int32)
    md = np.zeros((L, md_cap), np.int8)
    mdlen = np.zeros(L, np.int32)
    nm = np.zeros(L, np.int32)

    rc = lib.monitpu_fit_align_batch(
        queries.ctypes.data, qlens.ctypes.data,
        ctypes.c_int64(queries.shape[1]),
        targets.ctypes.data, tlens.ctypes.data,
        ctypes.c_int64(targets.shape[1]),
        active.ctypes.data, ctypes.c_int64(L),
        ctypes.c_int32(smatch), ctypes.c_int32(smismatch),
        ctypes.c_int32(gapo), ctypes.c_int32(gape),
        tends.ctypes.data if tends is not None else None,
        expected.ctypes.data if expected is not None else None,
        ctypes.c_int32(band_w),
        score.ctypes.data, tstart.ctypes.data, rlen.ctypes.data,
        cigar.ctypes.data, ncigar.ctypes.data, ctypes.c_int64(cigar_cap),
        md.ctypes.data, mdlen.ctypes.data, ctypes.c_int64(md_cap),
        nm.ctypes.data, ctypes.c_int32(n_threads))
    if rc != 0:
        raise RuntimeError(f"fit_align_batch rc={rc}")

    ops_out, md_out = [], []
    for l in range(L):
        if not active[l]:
            ops_out.append(None)
            md_out.append(None)
            continue
        ops = [( _OPS[int(c) & 0xF], int(c) >> 4)
               for c in cigar[l, :ncigar[l]]]
        ops_out.append(ops)
        md_out.append(md[l, :mdlen[l]].tobytes().decode())
    return {"score": score, "tstart": tstart, "rlen": rlen, "nm": nm,
            "ops": ops_out, "md": md_out}
