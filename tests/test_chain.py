"""Chaining kernel vs host transliteration of the reference DP
(chain.hpp:276-362, max_pred pruning disabled as documented)."""

import numpy as np
import jax.numpy as jnp

from monitpu.ops.chain import (ChainConfig, chain_dp, extract_chains,
                               compact_and_sort_anchors)

CFG = ChainConfig()


def host_chain_dp(x, y, w, mate, valid, avg_mem_len, cfg=CFG):
    A = len(x)
    NEG = -(2**30)
    f = np.full(A, NEG, dtype=np.int64)
    p = np.full(A, -1, dtype=np.int64)
    for i in range(A):
        if not valid[i]:
            continue
        max_f, max_j = w[i], -1
        for j in range(i - 1, max(i - cfg.max_iter, 0) - 1, -1):
            if not valid[j]:
                continue
            if (mate[i] != mate[j]) and ((mate[i] ^ mate[j]) != 3):
                continue
            if x[i] > x[j] + cfg.max_dist_x:
                continue
            xd = x[i] - x[j]
            yd = y[i] - y[j]
            l = abs(yd - xd)
            ilog = int(l).bit_length() - 1 if l > 0 else 0
            if mate[i] == mate[j] and (y[j] >= y[i] or yd > cfg.max_dist_y):
                continue
            alpha = min(yd, xd, w[i])
            if mate[i] != mate[j]:
                beta = 1 if xd == 0 else min(int(l * .01 * avg_mem_len), ilog)
            else:
                beta = (int(l * .01 * avg_mem_len) + ilog) >> 1 if l > 0 else 0
            score = f[j] + alpha - beta
            if score > max_f:
                max_f, max_j = score, j
        f[i], p[i] = max_f, max_j
    return f, p


def random_anchor_set(rng, A=40, B=1):
    """Clustered anchors simulating MEM occurrences of a read."""
    xs, ys, ws, mates = [], [], [], []
    for _ in range(A):
        if rng.random() < 0.7:  # clustered colinear anchors
            base = int(rng.integers(0, 3)) * 10000
            off = int(rng.integers(0, 200))
            l = int(rng.integers(10, 40))
            xs.append(base + off + l - 1)
            ys.append(off % 120 + l - 1)
        else:
            l = int(rng.integers(10, 40))
            xs.append(int(rng.integers(0, 30000)))
            ys.append(int(rng.integers(0, 120)))
        ws.append(l)
        mates.append(int(rng.choice([0, 3])))  # MATE_1|F=0b?? simplified codes
    order = np.argsort(xs, kind="stable")
    return (np.array(xs)[order], np.array(ys)[order], np.array(ws)[order],
            np.array(mates)[order])


def test_chain_dp_parity(rng):
    B = 6
    A = 40
    xs = np.zeros((B, A), np.int32)
    ys = np.zeros((B, A), np.int32)
    ws = np.zeros((B, A), np.int32)
    mates = np.zeros((B, A), np.int32)
    for b in range(B):
        xs[b], ys[b], ws[b], mates[b] = random_anchor_set(rng, A)
    valid = np.ones((B, A), bool)
    avg = ws.mean(axis=1).astype(np.float32)

    anchors = {"x": jnp.asarray(xs), "y": jnp.asarray(ys),
               "w": jnp.asarray(ws), "mate": jnp.asarray(mates),
               "valid": jnp.asarray(valid),
               "pos": jnp.asarray(xs), "idx": jnp.asarray(ys)}
    f, p = chain_dp(anchors, jnp.asarray(avg), CFG)
    f, p = np.asarray(f), np.asarray(p)
    for b in range(B):
        ef, ep = host_chain_dp(xs[b], ys[b], ws[b], mates[b], valid[b],
                               float(avg[b]))
        np.testing.assert_array_equal(f[b], ef, err_msg=f"f row {b}")
        np.testing.assert_array_equal(p[b], ep, err_msg=f"p row {b}")


def test_extract_chains_simple():
    # one obvious colinear chain: anchors at x=100,150,200 (len 20)
    B, A = 1, 8
    x = np.full((B, A), 2**29, np.int32)
    y = np.zeros((B, A), np.int32)
    w = np.zeros((B, A), np.int32)
    mate = np.zeros((B, A), np.int32)
    valid = np.zeros((B, A), bool)
    for k, (xx, yy) in enumerate([(119, 19), (169, 69), (219, 119)]):
        x[0, k], y[0, k], w[0, k], valid[0, k] = xx, yy, 20, True
    anchors = {"x": jnp.asarray(x), "y": jnp.asarray(y), "w": jnp.asarray(w),
               "mate": jnp.asarray(mate), "valid": jnp.asarray(valid),
               "pos": jnp.asarray(x - 19), "idx": jnp.asarray(y - 19)}
    avg = jnp.asarray([20.0], jnp.float32)
    f, p = chain_dp(anchors, avg, CFG)
    chains = extract_chains(anchors, f, p, CFG)
    assert bool(chains["valid"][0, 0])
    assert int(chains["length"][0, 0]) == 3
    np.testing.assert_array_equal(
        np.asarray(chains["anchors"][0, 0, :3]), [0, 1, 2])
    # score: 20 + 2*(min(50,50,20) - beta(l=0)) = 20 + 40
    assert int(chains["score"][0, 0]) == 60
    # second chain slot should be invalid (same path, marked)
    assert not bool(chains["valid"][0, 1])


def test_compact_and_sort():
    B, S = 1, 6
    x = np.array([[50, 10, 99, 20, 5, 70]], np.int32)
    valid = np.array([[True, True, False, True, True, False]])
    anchors = {"x": jnp.asarray(x), "y": jnp.asarray(x), "w": jnp.asarray(x),
               "mate": jnp.zeros((B, S), jnp.int32),
               "pos": jnp.asarray(x), "idx": jnp.asarray(x),
               "valid": jnp.asarray(valid)}
    out = compact_and_sort_anchors(anchors, 4)
    np.testing.assert_array_equal(np.asarray(out["x"][0]), [5, 10, 20, 50])
    assert int(out["count"][0]) == 4
