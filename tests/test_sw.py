"""SW fitting-alignment kernel vs O(QT) NumPy oracle; traceback CIGAR
must reproduce the optimal score exactly."""

import numpy as np
import jax.numpy as jnp

from monitpu.ops.sw import SWParams, sw_fit, traceback_cigar

P = SWParams()
MAT = P.matrix()
NEG = -(2**28)


def oracle_fit(q, t):
    """Fitting alignment score: full q, free target start/end."""
    Q, T = len(q), len(t)
    go, ge = P.gapo, P.gape
    H = np.full((Q + 1, T + 1), NEG, dtype=np.int64)
    E = np.full((Q + 1, T + 1), NEG, dtype=np.int64)  # gap in target (D)
    F = np.full((Q + 1, T + 1), NEG, dtype=np.int64)  # gap in query (I)
    H[0, :] = 0
    for i in range(1, Q + 1):
        H[i, 0] = -(go + i * ge)
        for j in range(1, T + 1):
            E[i, j] = max(E[i, j - 1], H[i, j - 1] - go) - ge
            F[i, j] = max(F[i - 1, j], H[i - 1, j] - go) - ge
            H[i, j] = max(H[i - 1, j - 1] + MAT[q[i - 1], t[j - 1]],
                          E[i, j], F[i, j])
    return int(H[Q, 1:].max()), int(H[Q, 1:].argmax())


def score_cigar(q, t, ops, tstart):
    """Recompute alignment score from CIGAR ops."""
    go, ge = P.gapo, P.gape
    s = 0
    i, j = 0, tstart
    for op, l in ops:
        if op == "M":
            for _ in range(l):
                s += MAT[q[i], t[j]]
                i += 1
                j += 1
        elif op == "I":
            s -= go + l * ge
            i += l
        else:
            s -= go + l * ge
            j += l
    assert i == len(q)
    return s, j


def rand_pair(rng, Q, T, mutate=0.1):
    t = rng.integers(1, 5, size=T).astype(np.int32)
    start = int(rng.integers(0, max(T - Q, 1)))
    q = t[start:start + Q].copy()
    if len(q) < Q:
        q = np.concatenate([q, rng.integers(1, 5, size=Q - len(q))])
    k = int(mutate * Q)
    if k:
        pos = rng.integers(0, Q, size=k)
        q[pos] = rng.integers(1, 5, size=k)
    # random indel
    if rng.random() < 0.5 and Q > 10:
        cut = int(rng.integers(2, 6))
        at = int(rng.integers(1, Q - cut))
        q = np.concatenate([q[:at], q[at + cut:],
                            rng.integers(1, 5, size=cut)])[:Q]
    return q.astype(np.int32), t


def test_sw_fit_score_parity(rng):
    B, Q, T = 10, 32, 48
    qs = np.zeros((B, Q), np.int32)
    ts = np.zeros((B, T), np.int32)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b in range(B):
        ql = int(rng.integers(8, Q + 1))
        tl = int(rng.integers(12, T + 1))
        q, t = rand_pair(rng, ql, tl)
        qs[b, :ql] = q
        ts[b, :tl] = t
        qlens[b], tlens[b] = ql, tl
    out = sw_fit(jnp.asarray(qs), jnp.asarray(qlens), jnp.asarray(ts),
                 jnp.asarray(tlens), P)
    score = np.asarray(out["score"])
    for b in range(B):
        exp, _ = oracle_fit(qs[b, :qlens[b]], ts[b, :tlens[b]])
        assert score[b] == exp, f"lane {b}: {score[b]} != {exp}"


def test_sw_traceback_reproduces_score(rng):
    B, Q, T = 8, 28, 40
    qs = np.zeros((B, Q), np.int32)
    ts = np.zeros((B, T), np.int32)
    qlens = np.full(B, Q, np.int32)
    tlens = np.full(B, T, np.int32)
    for b in range(B):
        q, t = rand_pair(rng, Q, T, mutate=0.15)
        qs[b], ts[b] = q, t
    out = sw_fit(jnp.asarray(qs), jnp.asarray(qlens), jnp.asarray(ts),
                 jnp.asarray(tlens), P, traceback=True)
    score = np.asarray(out["score"])
    walks = traceback_cigar(out["dirs"], qlens, np.asarray(out["tend"]))
    for b in range(B):
        exp, _ = oracle_fit(qs[b], ts[b])
        assert score[b] == exp
        ops, tstart = walks[b]
        got, jend = score_cigar(qs[b], ts[b], ops, tstart)
        assert got == score[b], f"lane {b}: cigar score {got} != {score[b]}"
        assert jend - 1 == int(out["tend"][b])


def test_sw_perfect_match():
    t = np.concatenate([np.full(7, 2), np.array([1, 2, 3, 4] * 5),
                        np.full(9, 3)]).astype(np.int32)
    q = np.array([1, 2, 3, 4] * 5, np.int32)
    out = sw_fit(jnp.asarray(q[None, :]), jnp.asarray([20]),
                 jnp.asarray(t[None, :]), jnp.asarray([len(t)]), P,
                 traceback=True)
    assert int(out["score"][0]) == 40
    ops, tstart = traceback_cigar(out["dirs"], [20], np.asarray(out["tend"]))[0]
    assert ops == [["M", 20]]
    assert tstart == 7


def test_sw_sep_blocks_crossing():
    # target contains a SEP: alignment must not cross it
    t = np.array([1, 2, 3, 4, 0, 1, 2, 3, 4], np.int32)
    q = np.array([1, 2, 3, 4, 1, 2, 3, 4], np.int32)
    out = sw_fit(jnp.asarray(q[None, :]), jnp.asarray([8]),
                 jnp.asarray(t[None, :]), jnp.asarray([9]), P)
    # best: match 4, pay gap for the rest (or clip-like I ops)
    assert int(out["score"][0]) < 16
