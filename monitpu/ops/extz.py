"""Device-exact extz-semantics Smith-Waterman score pass.

The reference's dominant compute phase is `ksw_extz2_sse` (banded affine
SW; called from fill_chain at /root/reference/include/aligner/
aligner_ksw2.hpp:2812, 2844, 2965, 2988, 3015). The native runtime's
host scalar lane (native/extz_core.h) pins its output contract: corner
score H[qlen-1][tlen-1], mqe = max of the last query row, mqe_t = FIRST
argmax target index, N/SEP score 0, affine gap -(go + l*ge).

This module computes that contract EXACTLY on the TPU for a batch of
jobs so every score-only chain_score call runs on the chip, keeping
host traceback only for the per-read winner — the same score_only /
finalize split as the reference (aligner_ksw2.hpp:2068-2075).

Exactness of the row recurrence: within a row,
  E[j] = max(E[j-1], H[j-1] - go) - ge
and the E-through-H feedback can be dropped because opening a gap from
an E cell is never better than extending it (go >= 0). With
Ht = max(M, F) (the row's H candidates excluding E):
  E[j] = max_{k<=j-1} (HT[k] - go - (j-k)*ge),   HT[-1] = row boundary
which is a running max of (HT[k] + k*ge) — one exact jax.lax.cummax per
row. int32 throughout; ties in max/argmax reproduce extz_lane's strict
'>' scan (first maximum). Parity pinned by tests/test_extz_device.py
over random + degenerate shapes against the host lane.

Jobs reference device-resident data (the read-lane matrix already on
device for the seed stage, the text in HBM), so the host->device job
stream is 7 small int32 vectors and the device->host result is 3 —
essential under a ~25 ms/transfer, ~25 MB/s device->host tunnel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(1 << 28)     # EXTZ_NEG (native/extz_core.h)


@functools.partial(
    jax.jit, static_argnames=("QMAX", "TMAX", "sm", "sx", "go", "ge"))
def extz_score_fused(text, lanes, jobs7, QMAX, TMAX,
                     sm=2, sx=4, go=4, ge=2):
    """extz_score_batch with the 7 per-job vectors fused into ONE
    int64 [7, J] matrix (rows: qrow, qoff, qrev, qlen, tpos, trev,
    tlen) — one host->device transfer instead of seven; the tunnel
    charges ~10-40 ms latency per transfer."""
    i32 = lambda r: jobs7[r].astype(jnp.int32)
    return extz_score_batch(
        text, lanes, i32(0), i32(1), jobs7[2] != 0, i32(3),
        jobs7[4], jobs7[5] != 0, i32(6), QMAX=QMAX, TMAX=TMAX,
        sm=sm, sx=sx, go=go, ge=ge)


@functools.partial(
    jax.jit, static_argnames=("QMAX", "TMAX", "sm", "sx", "go", "ge"))
def extz_score_batch(tnib, lanes, qrow, qoff, qrev, qlen,
                     tpos, trev, tlen, QMAX, TMAX,
                     sm=2, sx=4, go=4, ge=2):
    """Exact extz score DP for J jobs.

    tnib: uint32[K, 32] nibble-row device text (ops/ms.nib_rows — the
    single device text encoding); lanes: int8/int32[R, M] read codes.
    Per job: query char k = lanes[qrow, qoff +/- k] (qrev flips the
    direction), target char k = text[tpos + k] or text[tpos + tlen-1-k]
    (trev). Requires 1 <= qlen <= QMAX, 1 <= tlen <= TMAX, TMAX % 8 ==
    0, and forward target windows in [0, n] (the native broker only
    emits clamped windows; degenerate/oversized jobs run host-side).

    The target fetch is ceil((255+TMAX)/256) nibble-row gathers per job
    + in-register shifts, NOT a per-char gather — per-element random
    gathers of the old byte text were the kernel's dominant HBM cost.
    Reversed targets reverse the aligned window in-register
    (nib_reverse_words) and re-shift by TMAX - tlen.

    Returns (mqe, mqe_t, corner) int32[J]."""
    from .ms import nib_window_words, nib_expand, nib_reverse_words, \
        _shift_window
    J = qrow.shape[0]
    M = lanes.shape[1]
    assert TMAX % 8 == 0

    k = jnp.arange(QMAX, dtype=jnp.int32)
    qidx = qoff[:, None] + jnp.where(qrev[:, None], -k[None, :], k[None, :])
    q = lanes[qrow[:, None], jnp.clip(qidx, 0, M - 1)].astype(jnp.int32)

    Tw = TMAX // 8
    w_fwd = nib_window_words(tnib, tpos, Tw)   # int64 on wide indexes
    # reversed framing: char k = forward char tlen-1-k. Reverse the
    # whole aligned window, then shift left by (TMAX - tlen) chars.
    wr = jnp.concatenate(
        [nib_reverse_words(w_fwd),
         jnp.zeros((J, Tw + 1), jnp.uint32)], axis=1)
    w_rev = _shift_window(wr, (jnp.int32(TMAX) - tlen).astype(jnp.int32),
                          Tw)
    t = nib_expand(jnp.where(trev[:, None], w_rev, w_fwd))
    t_n = (t == 0) | (t == 5)

    karr = jnp.arange(TMAX, dtype=jnp.int32)
    ge32, go32 = jnp.int32(ge), jnp.int32(go)
    H0 = -(go32 + ge32 * (karr + 1))[None, :].repeat(J, 0)   # H[-1][j]
    F0 = jnp.full((J, TMAX), NEG, jnp.int32)
    col = karr[None, :]
    in_t = col < tlen[:, None]

    init = (H0, F0,
            jnp.zeros((J,), jnp.int32),            # mqe
            jnp.full((J,), -1, jnp.int32),         # mqe_t
            jnp.zeros((J,), jnp.int32))            # corner

    def row(carry, xs):
        Hp, F, mqe, mqe_t, corner = carry
        qi, i = xs                                  # qi: int32[J]
        qi_n = (qi == 0) | (qi == 5)
        s = jnp.where(qi_n[:, None] | t_n, 0,
                      jnp.where(qi[:, None] == t, sm, -sx)).astype(jnp.int32)
        hb_prev = jnp.where(i == 0, 0, -(go32 + ge32 * i))   # H[i-1][-1]
        hb = -(go32 + ge32 * (i + 1))                        # H[i][-1]
        M_ = jnp.concatenate(
            [jnp.full((J, 1), hb_prev, jnp.int32), Hp[:, :-1]], axis=1) + s
        Fn = jnp.maximum(F - ge32, Hp - go32 - ge32)
        Ht = jnp.maximum(M_, Fn)
        # E[j] = max_{k<=j-1}(HT[k] - go - (j-k)*ge)
        #      = cummax(HT[k] + k*ge)[j-1] - go - j*ge, HT[-1] = hb
        A = Ht + col * ge32
        P = jax.lax.cummax(jnp.concatenate(
            [jnp.full((J, 1), hb - ge32, jnp.int32), A[:, :-1]], axis=1),
            axis=1)
        E = P - go32 - col * ge32
        Hn = jnp.maximum(Ht, E)

        last = (i == qlen - 1)
        rowv = jnp.where(in_t, Hn, NEG)
        rmax = jnp.max(rowv, axis=1)
        rarg = jnp.argmax(rowv, axis=1).astype(jnp.int32)
        cval = jnp.take_along_axis(
            Hn, jnp.clip(tlen[:, None] - 1, 0, TMAX - 1), axis=1)[:, 0]
        mqe = jnp.where(last, rmax, mqe)
        mqe_t = jnp.where(last, rarg, mqe_t)
        corner = jnp.where(last, cval, corner)
        return (Hn, Fn, mqe, mqe_t, corner), None

    (_, _, mqe, mqe_t, corner), _ = jax.lax.scan(
        row, init, (q.T, jnp.arange(QMAX, dtype=jnp.int32)))
    return mqe, mqe_t, corner


# host-side tiering: (QMAX, TMAX) buckets so tiny gap jobs don't pay a
# full-read-width DP and each distinct shape compiles once. Tier 0
# covers the per-gap globals (typically a few bp around a SNP), tier 1
# the SHORT context extensions (most lc/rc jobs: the read context is
# the error-adjacent stub, rarely > 64 chars — the scan row count is
# the kernel's whole cost), tier 2 the long context extensions, tier 3
# the rare whole-chain realigns.
def job_tiers(read_pad, ext_len):
    q = -(-read_pad // 32) * 32
    t1 = max(-(-(ext_len + 8) // 64) * 64, 128)
    t2 = max(-(-(read_pad + 2 * ext_len + 32) // 128) * 128, t1)
    return [(32, 32), (min(64, q), t1), (q, t1), (q, t2)]


def job_caps(read_pad, ext_len):
    tiers = job_tiers(read_pad, ext_len)
    return max(t[0] for t in tiers), max(t[1] for t in tiers)


# fixed job-chunk size: every dispatch issues ceil(J / J_BUCKET) calls
# of EXACTLY J_BUCKET jobs per tier, so each tier has ONE executable,
# compiled on the tier's first use (SE warmup exercises all tiers) and
# never again — round 5 measured 86 s of mid-run tier recompiles when
# PE's job counts crossed the former high-water buckets. Calls within a
# dispatch enqueue back-to-back (async); results ride one fused pull.
J_BUCKET = 2048


def dispatch_extz_jobs(text, lanes, jobs, read_pad, ext_len, sw,
                       score=None):
    """Dispatch a numpy job dict through the tiered device kernels
    ASYNCHRONOUSLY: returns a continuation state whose device work is
    enqueued now (so the caller can enqueue the NEXT batch's seed stage
    behind it — the device queue is FIFO) and collected later by
    collect_extz_jobs. All tiers' results ride ONE fused [3, sum(Jp)]
    device array = one device->host pull (~25 ms/transfer tunnel).

    score: extz_score_fused-compatible callable override (the
    index-sharded path binds its sharded text rows there and ignores
    the text argument; parallel/shard_index.make_sharded_extz)."""
    J = jobs["qrow"].shape[0]
    if J == 0:
        return (J, [], None)
    tiers = job_tiers(read_pad, ext_len)
    assigned = np.full(J, len(tiers) - 1, np.int32)
    for t in range(len(tiers) - 2, -1, -1):
        fits = (jobs["qlen"] <= tiers[t][0]) & (jobs["tlen"] <= tiers[t][1])
        assigned = np.where(fits, t, assigned)
    parts, devs = [], []
    for t, tier in enumerate(tiers):
        idx_t = np.flatnonzero(assigned == t)
        for s in range(0, idx_t.size, J_BUCKET):
            idx = idx_t[s:s + J_BUCKET]
            # all 7 job vectors ride ONE fused [7, J_BUCKET] int64 H2D;
            # pad jobs are valid 1x1 DPs whose results are dropped
            fused = np.zeros((7, J_BUCKET), np.int64)
            for r, k in enumerate(("qrow", "qoff", "qrev", "qlen",
                                   "tpos", "trev", "tlen")):
                fused[r, :idx.size] = jobs[k][idx]
            fused[3, idx.size:] = 1     # qlen pad
            fused[6, idx.size:] = 1     # tlen pad
            mqe, mqt, cor = (score or extz_score_fused)(
                text, lanes, jnp.asarray(fused),
                QMAX=tier[0], TMAX=tier[1],
                sm=sw.smatch, sx=sw.smismatch, go=sw.gapo, ge=sw.gape)
            parts.append((idx, J_BUCKET))
            devs.append(jnp.stack([mqe, mqt, cor]))
    fused = jnp.concatenate(devs, axis=1) if devs else None
    return (J, parts, fused)


def collect_extz_jobs(state):
    """Block on and scatter the dispatched results -> numpy
    (mqe, mqe_t, corner) int32[J]."""
    J, parts, fused = state
    out_mqe = np.zeros(J, np.int32)
    out_mqt = np.full(J, -1, np.int32)
    out_cor = np.zeros(J, np.int32)
    if fused is None:
        return out_mqe, out_mqt, out_cor
    res = np.asarray(fused)
    off = 0
    for idx, Jp in parts:
        out_mqe[idx] = res[0, off:off + idx.size]
        out_mqt[idx] = res[1, off:off + idx.size]
        out_cor[idx] = res[2, off:off + idx.size]
        off += Jp
    return out_mqe, out_mqt, out_cor


def run_extz_jobs(text, lanes, jobs, read_pad, ext_len, sw):
    """Synchronous dispatch+collect (tests / simple callers)."""
    return collect_extz_jobs(
        dispatch_extz_jobs(text, lanes, jobs, read_pad, ext_len, sw))
