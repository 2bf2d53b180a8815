"""Native C++ finalize pass vs the JAX SW kernel and the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from monitpu.ops.sw import SWParams, sw_fit

native = pytest.importorskip("monitpu.native.swalign")
from tests.test_sw import oracle_fit, score_cigar, rand_pair, P


def test_native_matches_kernel_and_oracle(rng):
    L, Q, T = 12, 40, 64
    qs = np.zeros((L, Q), np.int8)
    ts = np.zeros((L, T), np.int8)
    qlens = np.zeros(L, np.int32)
    tlens = np.zeros(L, np.int32)
    for l in range(L):
        ql = int(rng.integers(10, Q + 1))
        tl = int(rng.integers(16, T + 1))
        q, t = rand_pair(rng, ql, tl, mutate=0.15)
        qs[l, :ql] = q
        ts[l, :tl] = t
        qlens[l], tlens[l] = ql, tl
    active = np.ones(L, bool)
    out = native.fit_align_batch(qs, qlens, ts, tlens, active)

    kout = sw_fit(jnp.asarray(qs, jnp.int32), jnp.asarray(qlens),
                  jnp.asarray(ts, jnp.int32), jnp.asarray(tlens), P)
    kscore = np.asarray(kout["score"])
    for l in range(L):
        exp, _ = oracle_fit(qs[l, :qlens[l]], ts[l, :tlens[l]])
        assert out["score"][l] == exp, f"lane {l} score vs oracle"
        assert out["score"][l] == kscore[l], f"lane {l} score vs kernel"
        got, jend = score_cigar(qs[l, :qlens[l]], ts[l, :tlens[l]],
                                out["ops"][l], out["tstart"][l])
        assert got == exp, f"lane {l} cigar reproduces score"
        assert out["rlen"][l] == jend - out["tstart"][l]


def test_native_md_nm(rng):
    from monitpu.align.sam import md_nm_from_ops
    L, Q, T = 6, 30, 50
    qs = np.zeros((L, Q), np.int8)
    ts = np.zeros((L, T), np.int8)
    for l in range(L):
        q, t = rand_pair(rng, Q, T, mutate=0.1)
        qs[l], ts[l] = q, t
    qlens = np.full(L, Q, np.int32)
    tlens = np.full(L, T, np.int32)
    out = native.fit_align_batch(qs, qlens, ts, tlens, np.ones(L, bool))
    for l in range(L):
        ref_slice = ts[l, out["tstart"][l]:]
        md, nm = md_nm_from_ops(ref_slice, qs[l], out["ops"][l])
        assert out["md"][l] == md, f"lane {l} MD"
        assert out["nm"][l] == nm, f"lane {l} NM"


def test_native_inactive_lanes(rng):
    qs = np.ones((2, 10), np.int8)
    ts = np.ones((2, 20), np.int8)
    active = np.array([True, False])
    out = native.fit_align_batch(qs, np.full(2, 10, np.int32),
                                 ts, np.full(2, 20, np.int32), active)
    assert out["ops"][1] is None
    assert out["score"][0] == 20


# ---- banded extz with certificate: bit-exact vs the full lane ----

def _extz_raw(banded, q, t, flags, need=3, band0=2, sm=2, sx=4, go=4, ge=2):
    """Call monitpu_extz / monitpu_extz_banded through ctypes."""
    import ctypes
    from monitpu.native.sais import _load
    from monitpu.oracle.ksw2 import _configure
    lib = _configure(_load())
    c = ctypes
    q = np.ascontiguousarray(q, np.int8)
    t = np.ascontiguousarray(t, np.int8)
    score, mqe, mqe_t = c.c_int32(), c.c_int32(), c.c_int32()
    cap = q.size + t.size + 8
    cig = np.zeros(cap, np.uint32)
    ncig = c.c_int32(0)
    if banded:
        lib.monitpu_extz_banded.restype = c.c_int
        lib.monitpu_extz_banded.argtypes = [
            c.c_void_p, c.c_int32, c.c_void_p, c.c_int32,
            c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.c_int32, c.c_int32,
            c.c_void_p, c.c_void_p, c.c_void_p,
            c.c_void_p, c.c_void_p, c.c_int64]
        rc = lib.monitpu_extz_banded(
            q.ctypes.data, c.c_int32(q.size), t.ctypes.data,
            c.c_int32(t.size), c.c_int32(sm), c.c_int32(sx), c.c_int32(go),
            c.c_int32(ge), c.c_int32(flags), c.c_int32(need),
            c.c_int32(band0), c.byref(score), c.byref(mqe), c.byref(mqe_t),
            cig.ctypes.data, c.byref(ncig), c.c_int64(cap))
    else:
        rc = lib.monitpu_extz(
            q.ctypes.data, c.c_int32(q.size), t.ctypes.data,
            c.c_int32(t.size), c.c_int32(sm), c.c_int32(sx), c.c_int32(go),
            c.c_int32(ge), c.c_int32(flags), c.byref(score), c.byref(mqe),
            c.byref(mqe_t), cig.ctypes.data, c.byref(ncig), c.c_int64(cap))
    assert rc == 0
    return (score.value, mqe.value, mqe_t.value,
            tuple(cig[:ncig.value].tolist()))


def test_banded_extz_bit_exact_fuzz(rng):
    """The banded-with-certificate lane must be indistinguishable from
    the full DP on every output its `need` covers: scores, mqe/mqe_t
    tie-breaks, and the KSW_EZ_RIGHT traceback — across identities from
    clean to garbage (certificate failures must fall back cleanly)."""
    NEED_MQE, NEED_CORNER = 1, 2
    EXTZ_ONLY, SCORE_ONLY = 2, 1
    for trial in range(400):
        ql = int(rng.integers(1, 180))
        # target length regimes: similar, much longer, much shorter
        tl = int(rng.integers(1, [200, 60, 400][trial % 3]))
        mode = trial % 4
        if mode == 0:       # clean extension of q over t
            t = rng.integers(1, 5, tl).astype(np.int8)
            q = t[:ql].copy() if tl >= ql else np.concatenate(
                [t, rng.integers(1, 5, ql - tl)]).astype(np.int8)
        elif mode == 1:     # mutated copy (SNPs + indels)
            t = rng.integers(1, 5, tl).astype(np.int8)
            q = t[:min(ql, tl)].copy()
            for _ in range(int(rng.integers(0, 6))):
                if q.size and rng.random() < 0.6:
                    q[rng.integers(0, q.size)] = rng.integers(1, 5)
                elif q.size > 1 and rng.random() < 0.5:
                    q = np.delete(q, rng.integers(0, q.size))
                else:
                    q = np.insert(q, rng.integers(0, q.size + 1),
                                  rng.integers(1, 5))
            q = q.astype(np.int8)
            if q.size == 0:
                q = rng.integers(1, 5, 1).astype(np.int8)
        elif mode == 2:     # unrelated garbage (certificate must fail)
            t = rng.integers(1, 5, tl).astype(np.int8)
            q = rng.integers(1, 5, ql).astype(np.int8)
        else:               # N/SEP-rich (score-0 ties everywhere)
            t = rng.integers(0, 6, tl).astype(np.int8)
            q = rng.integers(0, 6, ql).astype(np.int8)
        for flags, need in ((EXTZ_ONLY, NEED_MQE), (0, NEED_CORNER),
                            (SCORE_ONLY, NEED_CORNER | NEED_MQE)):
            band0 = int(rng.integers(2, 24))
            full = _extz_raw(False, q, t, flags)
            band = _extz_raw(True, q, t, flags, need=need, band0=band0)
            if need & NEED_MQE:
                assert band[1] == full[1], (trial, flags, "mqe")
                assert band[2] == full[2], (trial, flags, "mqe_t")
            if need & NEED_CORNER:
                assert band[0] == full[0], (trial, flags, "corner")
            if not (flags & SCORE_ONLY):
                assert band[3] == full[3], (trial, flags, "cigar")
