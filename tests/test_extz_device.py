"""Device extz kernel == host extz_lane, bit-exact.

The VERDICT r2 bar for the device extension stage: pin (mqe, mqe_t,
corner) of ops/extz.extz_score_batch against the native scalar lane
(native/extz_core.h via oracle/ksw2.extz) on >= 10k random cases
including degenerate/adversarial shapes. mqe_t ties matter: both sides
must pick the FIRST maximum of the last row.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monitpu.oracle.ksw2 import extz as host_extz
from monitpu.ops.extz import extz_score_batch, run_extz_jobs, job_caps
from monitpu.ops.ms import nib_rows


def _nib(text):
    """int8 text -> device nibble-row table (pad so window gathers of
    any in-text start stay in range, as prepare_tables_host does)."""
    return jnp.asarray(nib_rows(np.concatenate(
        [np.asarray(text, np.uint8), np.zeros(4096, np.uint8)])))


class SW:
    smatch, smismatch, gapo, gape = 2, 4, 4, 2


def _host_ref(q, t, sm=2, sx=4, go=4, ge=2):
    out = host_extz(q, t, smatch=sm, smismatch=sx, gapo=go, gape=ge,
                    flags=1)  # SCORE_ONLY
    return out["mqe"], out["mqe_t"], out["score"]


def _run_device(cases, QMAX, TMAX, sm=2, sx=4, go=4, ge=2):
    """cases: list of (q codes, t codes). Builds a lanes/text layout and
    runs the kernel with all four (qrev, trev) framings mixed in."""
    J = len(cases)
    M = QMAX + 8
    rng = np.random.default_rng(0)
    lanes = rng.integers(1, 5, size=(J, M)).astype(np.int32)
    textlen = sum(len(t) for _, t in cases) + 16 * J + 64
    text = rng.integers(1, 5, size=textlen).astype(np.int8)
    qrow = np.arange(J, dtype=np.int32)
    qoff = np.zeros(J, np.int32)
    qrev = np.zeros(J, np.uint8)
    qlen = np.zeros(J, np.int32)
    tpos = np.zeros(J, np.int64)
    trev = np.zeros(J, np.uint8)
    tlen = np.zeros(J, np.int32)
    cur = 8
    for j, (q, t) in enumerate(cases):
        qlen[j] = len(q)
        tlen[j] = len(t)
        if j % 2:       # reversed query framing (the lc-job layout)
            qrev[j] = 1
            qoff[j] = len(q) - 1
            lanes[j, :len(q)] = q[::-1]
        else:
            lanes[j, :len(q)] = q
        if j % 3 == 0:  # reversed target framing
            trev[j] = 1
            text[cur:cur + len(t)] = np.asarray(t)[::-1]
        else:
            text[cur:cur + len(t)] = t
        tpos[j] = cur
        cur += len(t) + 3
    mqe, mqt, cor = extz_score_batch(
        _nib(text), jnp.asarray(lanes), jnp.asarray(qrow),
        jnp.asarray(qoff), jnp.asarray(qrev.astype(bool)),
        jnp.asarray(qlen), jnp.asarray(tpos),
        jnp.asarray(trev.astype(bool)), jnp.asarray(tlen),
        QMAX=QMAX, TMAX=TMAX, sm=sm, sx=sx, go=go, ge=ge)
    return np.asarray(mqe), np.asarray(mqt), np.asarray(cor)


def _check(cases, QMAX, TMAX):
    mqe, mqt, cor = _run_device(cases, QMAX, TMAX)
    for j, (q, t) in enumerate(cases):
        hm, ht, hc = _host_ref(np.asarray(q, np.int8), np.asarray(t, np.int8))
        assert (mqe[j], mqt[j], cor[j]) == (hm, ht, hc), (
            j, len(q), len(t), (mqe[j], mqt[j], cor[j]), (hm, ht, hc))


def test_extz_device_random_10k(rng):
    # 10k+ random jobs across three shape regimes, run in a few batches
    total = 0
    for trial in range(4):
        cases = []
        for _ in range(1400):
            ql = int(rng.integers(1, 32))
            tl = int(rng.integers(1, 32))
            cases.append((rng.integers(1, 5, size=ql).astype(np.int8),
                          rng.integers(1, 5, size=tl).astype(np.int8)))
        _check(cases, 32, 32)
        total += len(cases)
    cases = []
    for _ in range(1200):
        ql = int(rng.integers(1, 97))
        tl = int(rng.integers(1, 129))
        cases.append((rng.integers(1, 5, size=ql).astype(np.int8),
                      rng.integers(1, 5, size=tl).astype(np.int8)))
    _check(cases, 96, 128)
    total += len(cases)
    assert total >= 6800


def test_extz_device_correlated_and_n():
    """Related q/t (the realistic case: target contains the query with
    few edits) + N/SEP zero-score chars + tie-heavy inputs."""
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(1800):
        tl = int(rng.integers(4, 129))
        t = rng.integers(1, 5, size=tl).astype(np.int8)
        ql = int(rng.integers(1, min(tl + 8, 97)))
        off = int(rng.integers(0, max(tl - ql, 0) + 1))
        q = t[off:off + ql].copy()
        if q.size < ql:
            q = np.concatenate([q, rng.integers(1, 5, size=ql - q.size)
                                .astype(np.int8)])
        nerr = int(rng.integers(0, 4))
        for p in rng.integers(0, ql, size=nerr):
            q[p] = int(rng.integers(1, 5))
        if rng.random() < 0.3:     # N / SEP chars score 0
            q[rng.integers(0, ql)] = 5
        if rng.random() < 0.2:
            t[rng.integers(0, tl)] = 0
        cases.append((q, t))
    _check(cases, 96, 128)
    # tie-heavy: single-letter strings make every path equal-scoring
    mono = [(np.full(q, 1, np.int8), np.full(t, 1, np.int8))
            for q in (1, 2, 7, 17) for t in (1, 2, 9, 31)]
    _check(mono, 32, 32)


def test_extz_device_degenerate_edges():
    """qlen==QMAX / tlen==TMAX boundaries, 1x1, long-q-short-t."""
    rng = np.random.default_rng(11)
    cases = [
        (np.array([1], np.int8), np.array([1], np.int8)),
        (np.array([1], np.int8), np.array([2], np.int8)),
        (rng.integers(1, 5, size=32).astype(np.int8),
         rng.integers(1, 5, size=32).astype(np.int8)),
        (rng.integers(1, 5, size=32).astype(np.int8),
         np.array([3], np.int8)),
        (np.array([2], np.int8),
         rng.integers(1, 5, size=32).astype(np.int8)),
    ]
    _check(cases, 32, 32)


def test_run_extz_jobs_tiering(rng):
    """The tier dispatcher returns the same results as direct calls."""
    from monitpu.align.aligner import AlignConfig
    cfg = AlignConfig()
    J = 64
    M = cfg.read_pad
    lanes = jnp.asarray(rng.integers(1, 5, size=(8, M)).astype(np.int32))
    text_np = rng.integers(1, 5, size=4096).astype(np.int8)
    text = _nib(text_np)
    jobs = {
        "qrow": rng.integers(0, 8, size=J).astype(np.int32),
        "qoff": np.zeros(J, np.int32),
        "qrev": np.zeros(J, np.uint8),
        "qlen": rng.integers(1, M, size=J).astype(np.int32),
        "tpos": rng.integers(0, 3000, size=J).astype(np.int64),
        "trev": (rng.random(J) < 0.5).astype(np.uint8),
        "tlen": rng.integers(1, cfg.ext_len, size=J).astype(np.int32),
    }
    jobs["qoff"] = np.where(jobs["qrev"] > 0, jobs["qlen"] - 1, 0
                            ).astype(np.int32)
    mqe, mqt, cor = run_extz_jobs(text, lanes, jobs, cfg.read_pad,
                                  cfg.ext_len, cfg.sw)
    ln = np.asarray(lanes)
    tx = text_np
    for j in range(J):
        ql, tl = int(jobs["qlen"][j]), int(jobs["tlen"][j])
        if jobs["qrev"][j]:
            q = ln[jobs["qrow"][j], jobs["qoff"][j] - np.arange(ql)]
        else:
            q = ln[jobs["qrow"][j], jobs["qoff"][j] + np.arange(ql)]
        tt = tx[int(jobs["tpos"][j]):int(jobs["tpos"][j]) + tl]
        if jobs["trev"][j]:
            tt = tt[::-1]
        hm, ht, hc = _host_ref(q.astype(np.int8), tt.astype(np.int8))
        assert (mqe[j], mqt[j], cor[j]) == (hm, ht, hc), j
