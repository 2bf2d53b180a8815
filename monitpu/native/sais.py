"""ctypes bindings for the native SA-IS / Kasai library.

Compiled on demand with g++ (cached next to the source); falls back is
handled by callers (monitpu.index.build uses NumPy doubling if this
module fails to import)."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRCS = [_HERE / "sais.cpp", _HERE / "swalign.cpp", _HERE / "ksw2.cpp",
         _HERE / "runtime.cpp", _HERE / "samfmt.cpp",
         _HERE / "cpuseeds.cpp"]
_HDRS = [_HERE / "extz_core.h"]
_SO = _HERE / "libmonitpu.so"
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not _SO.exists()) or _SO.stat().st_mtime < max(
                s.stat().st_mtime for s in _SRCS + _HDRS):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 *map(str, _SRCS), "-o", str(_SO), "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.monitpu_sais_u8.restype = ctypes.c_int
        lib.monitpu_sais_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.monitpu_kasai_u8.restype = ctypes.c_int
        lib.monitpu_kasai_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.monitpu_sais_u8_64.restype = ctypes.c_int
        lib.monitpu_sais_u8_64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.monitpu_kasai_u8_64.restype = ctypes.c_int
        lib.monitpu_kasai_u8_64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.monitpu_plcp_u8.restype = ctypes.c_int
        lib.monitpu_plcp_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
    return _lib


def plcp_inplace(text: np.ndarray, phi: np.ndarray) -> None:
    """Overwrite phi (int64[n]; -1 at rank-0 positions) with PLCP."""
    lib = _load()
    rc = lib.monitpu_plcp_u8(
        ctypes.c_void_p(np.ascontiguousarray(text.view(np.uint8)).ctypes.data),
        ctypes.c_int64(text.size),
        ctypes.c_void_p(phi.ctypes.data))
    if rc != 0:
        raise RuntimeError("monitpu_plcp_u8 failed")


# texts beyond this use the 64-bit SA/LCP path (mirrors the reference's
# 32/64-bit binary switch, pipeline/moni.in:195-204)
INT32_LIMIT = 2**31 - 2


def suffix_array(t: np.ndarray) -> np.ndarray:
    lib = _load()
    t = np.ascontiguousarray(t, dtype=np.uint8)
    n = t.size
    if n > INT32_LIMIT:
        # n+1 in-place buffer (the C side appends a sentinel suffix and
        # compacts in place — no internal 8 B/position SA copy)
        buf = np.empty(n + 1, dtype=np.int64)
        rc = lib.monitpu_sais_u8_64(t.ctypes.data, n, buf.ctypes.data)
        sa = buf[:n]
    else:
        sa = np.empty(n, dtype=np.int32)
        rc = lib.monitpu_sais_u8(t.ctypes.data, n, sa.ctypes.data)
    if rc != 0:
        raise RuntimeError(f"sais failed rc={rc}")
    return sa


def lcp_array(t: np.ndarray, sa: np.ndarray) -> np.ndarray:
    lib = _load()
    t = np.ascontiguousarray(t, dtype=np.uint8)
    n = t.size
    if sa.dtype == np.int64 or n > INT32_LIMIT:
        sa = np.ascontiguousarray(sa, dtype=np.int64)
        lcp = np.empty(n, dtype=np.int64)
        rc = lib.monitpu_kasai_u8_64(t.ctypes.data, sa.ctypes.data, n,
                                     lcp.ctypes.data)
    else:
        sa = np.ascontiguousarray(sa, dtype=np.int32)
        lcp = np.empty(n, dtype=np.int32)
        rc = lib.monitpu_kasai_u8(t.ctypes.data, sa.ctypes.data, n,
                                  lcp.ctypes.data)
    if rc != 0:
        raise RuntimeError(f"kasai failed rc={rc}")
    return lcp
