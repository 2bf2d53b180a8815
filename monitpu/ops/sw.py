"""Banded affine-gap Smith-Waterman on TPU (the --extend-path device
fitting kernel; the DEFAULT align path extends chains with the
reference-exact piecewise extz engine in native/runtime.cpp instead).

Reference usage (include/aligner/aligner_ksw2.hpp:2752-3196): chain
scoring pieces together ksw_extz2_sse extension alignments of the left
and right read contexts plus per-gap global alignments, with a global
"realign" fallback when chain anchors overlap. Our TPU-native design
collapses all of these into ONE uniform primitive per chain, the
*fitting alignment*: the full read is aligned inside the chain's
reference window with free target start/end (leading/trailing read
overhang pays standard gap penalties, exactly like ksw2's anchored
extension). This is the same objective the reference's realign path
optimizes (aligner_ksw2.hpp:2986-2996, whose score provably dominates
the piecewise score, see their assert at :3038); scores therefore match
or exceed the reference's piecewise chain scores. Documented divergence:
co-optimal CIGARs may differ from ksw2's KSW_EZ_RIGHT tie-breaking.

Kernel shape: lax.scan over query rows; the within-row E dependency
(gap along the target) is an affine max-plus recurrence solved with
jax.lax.associative_scan, so each row is O(T log T) vector work and the
whole DP is Q sequential steps — wavefront parallelism across the
batch dimension comes free. Scores are int32 on the VPU.

Scoring matrix: match/mismatch over A,C,G,T; N matches anything at 0
(ksw_gen_simple_mat semantics, aligner_ksw2.hpp:3199-3211); SEP scores
-2^14 so alignments cannot cross sequence boundaries (replaces
seqidx::valid post-hoc rejection, seqidx.hpp:164).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = np.int32(-(2**28))  # plain numpy: no backend init at import
SEP_SCORE = -(2**14)


@dataclasses.dataclass(frozen=True)
class SWParams:
    smatch: int = 2
    smismatch: int = 4
    gapo: int = 4
    gape: int = 2
    gapo2: int = 13   # long-gap cost, used for pure-gap closed forms
    gape2: int = 1

    def matrix(self) -> np.ndarray:
        m = np.full((6, 6), -self.smismatch, np.int32)
        np.fill_diagonal(m, self.smatch)
        m[5, :] = m[:, 5] = 0          # N
        m[0, :] = m[:, 0] = SEP_SCORE  # SEP
        return m

    def gap_cost(self, l):
        """Dual-affine closed form for a pure gap of length l
        (aligner_ksw2.hpp:2922)."""
        return np.minimum(self.gapo + l * self.gape,
                          self.gapo2 + l * self.gape2)


def _scan_E(U_shift, gapo, gape):
    """E[j] for a row: max-plus affine recurrence via associative scan.

    E[j] = max(E[j-1], H[j-1] - gapo) - gape, E[-1] = -inf, where
    H[j-1] = max(U_shift[j], E[j-1]) and U_shift[j] = U[j-1]
    (U_shift[0] = left border). Each step is e -> max(e, v_j) - gape with
    v_j = U_shift[j] - gapo; composition of maps e -> max(e+a, b) is
    associative."""
    v = U_shift - (gapo + gape)
    a = jnp.full_like(v, -gape)

    def combine(l, r):
        la, lb = l
        ra, rb = r
        return la + ra, jnp.maximum(lb + ra, rb)

    A, B = jax.lax.associative_scan(combine, (a, v), axis=-1)
    del A
    return B


@functools.partial(jax.jit, static_argnames=("params", "traceback"))
def sw_fit(query, qlen, target, tlen, params: SWParams = SWParams(),
           traceback: bool = False):
    """Fitting alignment: full query vs a window of target.

    query int32[B, Q] codes, qlen int32[B]; target int32[B, T], tlen
    int32[B] (pad target with SEP=0 codes for safety; scoring masks to
    j < tlen anyway).

    Returns dict: score int32[B] (max over last query row), tend int32[B]
    (0-based target index of last aligned column; -1 if alignment ends
    before consuming any target), plus dirs uint8[B, Q, T] when
    traceback=True. Bits: 0-1 H-source (0 diag, 1 E/del, 2 F/ins,
    3 start), 2: E came from E (gap extend), 3: F came from F."""
    B, Q = query.shape
    T = target.shape[1]
    go, ge = params.gapo, params.gape
    sm, sx = params.smatch, params.smismatch

    def char_score(qc, t):
        # arithmetic scoring instead of a matrix gather: gathers are the
        # slow path on the VPU, three selects are free
        s = jnp.where(qc == t, jnp.int32(sm), jnp.int32(-sx))
        s = jnp.where((qc == 5) | (t == 5), 0, s)        # N matches all at 0
        return jnp.where((qc == 0) | (t == 0), jnp.int32(SEP_SCORE), s)

    jcols = jnp.arange(T)[None, :]
    tmask = jcols < tlen[:, None]

    H0 = jnp.where(tmask, 0, NEG)          # free target start on row -1
    F0 = jnp.full((B, T), NEG)

    def border(i):
        return -(go + (i + 1) * ge)

    def row(carry, i):
        Hprev, Fprev, best, bestj = carry
        qc = jax.lax.dynamic_index_in_dim(query, i, 1, keepdims=False)
        s = char_score(qc[:, None], target)
        F = jnp.maximum(Fprev - ge, Hprev - go - ge)
        # H[i-1, -1]: 0 for i==0 (alignment may start at (0, 0)), else the
        # leading-query-insertion border
        hb_prev = jnp.where(i == 0, 0, border(i - 1))
        diag = jnp.concatenate(
            [jnp.full((B, 1), 1) * hb_prev, Hprev[:, :-1]], axis=1) + s
        U = jnp.maximum(diag, F)
        U_shift = jnp.concatenate(
            [jnp.full((B, 1), border(i)), U[:, :-1]], axis=1)
        E = _scan_E(U_shift, go, ge)
        H = jnp.maximum(U, E)

        Hm = jnp.where(tmask, H, NEG)
        last = i == qlen - 1
        rb = jnp.max(Hm, axis=1)
        rj = jnp.argmax(Hm, axis=1).astype(jnp.int32)
        best = jnp.where(last, rb, best)
        bestj = jnp.where(last, rj, bestj)

        if traceback:
            take_E = E >= U                      # prefer gap: right-align
            take_F = (F >= diag) & ~take_E
            src = jnp.where(take_E, 1, jnp.where(take_F, 2, 0)).astype(
                jnp.uint8)
            e_ext = (E == jnp.concatenate(
                [jnp.full((B, 1), NEG), E[:, :-1]], axis=1) - ge)
            f_ext = (F == Fprev - ge)
            dirs = (src | (e_ext.astype(jnp.uint8) << 2) |
                    (f_ext.astype(jnp.uint8) << 3))
        else:
            dirs = jnp.zeros((B, T), jnp.uint8)
        return (H, F, best, bestj), dirs

    init = (H0, F0, jnp.full((B,), NEG), jnp.full((B,), -1, jnp.int32))
    (H, F, best, bestj), dirs = jax.lax.scan(row, init, jnp.arange(Q))
    out = {"score": best, "tend": bestj}
    if traceback:
        out["dirs"] = jnp.transpose(dirs, (1, 0, 2))  # [B, Q, T]
    return out


@functools.partial(jax.jit, static_argnames=("params", "band_w"))
def sw_fit_banded(query, qlen, target, tlen, params: SWParams = SWParams(),
                  band_w: int = 48):
    """Banded fitting alignment score: full query inside a band of
    half-width band_w around the expected diagonal (query i <-> target
    column i — callers lay the window out so the chain's first anchor
    puts the read at target offset ~band_w, i.e. win_start =
    anchor_pos - anchor_idx - margin with margin == band_w).

    The reference runs ksw2 with a band (-w) for exactly this reason;
    paths drifting out of the band score lower, and the native finalize
    falls back to a full DP if its banded traceback disagrees.

    Diagonal-coordinate layout: state arrays are [B, W] with W =
    2*band_w+1, k = j - i; the band never shifts, the F dependency is a
    k+1 shift of the previous row, the in-row E dependency an
    associative scan over W (vs the full window T) — O(Q*W) work
    instead of O(Q*T).

    Documented divergence from sw_fit: paths with leading query
    insertions BEFORE the target window start (read hanging off the
    window's left edge) are not representable in the band; such reads
    re-run through the full DP in the finalize fallback.

    Returns dict(score int32[B], tend int32[B])."""
    B, Q = query.shape
    T = target.shape[1]
    W = 2 * band_w + 1
    go, ge = params.gapo, params.gape
    sm, sx = params.smatch, params.smismatch

    def char_score(qc, t):
        s = jnp.where(qc == t, jnp.int32(sm), jnp.int32(-sx))
        s = jnp.where((qc == 5) | (t == 5), 0, s)
        return jnp.where((qc == 0) | (t == 0), jnp.int32(SEP_SCORE), s)

    ks = jnp.arange(W)[None, :]
    # pad target so the per-row band slice never clamps
    tpad = jnp.pad(target, ((0, 0), (0, W + 1)))

    H0 = jnp.zeros((B, W), jnp.int32)        # row -1: free target start
    F0 = jnp.full((B, W), NEG)

    def row(carry, i):
        Hprev, Fprev, best, bestj = carry
        j = i + ks                            # target column per band cell
        jvalid = j < tlen[:, None]
        qc = jax.lax.dynamic_index_in_dim(query, i, 1, keepdims=False)
        tband = jax.lax.dynamic_slice_in_dim(tpad, i, W, axis=1)
        s = char_score(qc[:, None], tband)
        # F: gap along query; sources are previous row at k+1
        Hup = jnp.concatenate([Hprev[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        Fup = jnp.concatenate([Fprev[:, 1:], jnp.full((B, 1), NEG)], axis=1)
        F = jnp.maximum(Fup - ge, Hup - go - ge)
        diag = Hprev + s                      # H[i-1][j-1] is same k
        U = jnp.maximum(diag, F)
        # E: gap along target; in-row scan, left-of-band = -inf
        U_shift = jnp.concatenate([jnp.full((B, 1), NEG), U[:, :-1]], axis=1)
        E = _scan_E(U_shift, go, ge)
        H = jnp.where(jvalid, jnp.maximum(U, E), NEG)

        last = i == qlen - 1
        rb = jnp.max(H, axis=1)
        rk = jnp.argmax(H, axis=1).astype(jnp.int32)
        best = jnp.where(last, rb, best)
        bestj = jnp.where(last, i + rk, bestj)
        return (H, F, best, bestj), None

    init = (H0, F0, jnp.full((B,), NEG), jnp.full((B,), -1, jnp.int32))
    (H, F, best, bestj), _ = jax.lax.scan(row, init, jnp.arange(Q))
    return {"score": best, "tend": bestj}


def traceback_cigar(dirs, qlen, tend, batch_hint=None):
    """Host walk of the packed direction bits -> per-lane CIGAR op lists.

    dirs uint8[B, Q, T]; returns list of (ops, tstart) where ops is a
    list of (op, length) with op in 'MID' (query-consuming M/I,
    target-consuming M/D), leading target offset tstart (0-based column
    where the alignment begins)."""
    dirs = np.asarray(dirs)
    qlen = np.asarray(qlen)
    tend = np.asarray(tend)
    B, Q, T = dirs.shape
    results = []
    for b in range(B):
        i = int(qlen[b]) - 1
        j = int(tend[b])
        ops = []

        def push(op):
            if ops and ops[-1][0] == op:
                ops[-1][1] += 1
            else:
                ops.append([op, 1])

        state = "H"
        while i >= 0:
            if j < 0:
                push("I")
                i -= 1
                continue
            d = dirs[b, i, j]
            if state == "H":
                src = d & 3
                if src == 0:
                    push("M")
                    i -= 1
                    j -= 1
                elif src == 1:
                    state = "E"
                else:
                    state = "F"
            elif state == "E":   # deletion: consume target
                push("D")
                if not (d & 4):
                    state = "H"
                j -= 1
            else:                # F: insertion: consume query
                push("I")
                if not (d & 8):
                    state = "H"
                i -= 1
        ops.reverse()
        results.append((ops, j + 1))
    return results
