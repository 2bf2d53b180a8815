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
