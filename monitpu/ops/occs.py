"""Batched MEM occurrence enumeration via Phi walks.

Reference: seed_finder::find_MEM_above/below + populate_seed
(include/aligner/seed_finder.hpp:169-329) walk the SA-neighbor graph from
one known occurrence while the LCP with the neighbor stays >= the MEM
length, using moni_lcp's O(1) Phi/Phi^-1-with-LCP.

TPU design: one lane per seed slot, all lanes walk in lockstep inside a
while_loop; each step is a searchsorted into the successor-anchor arrays
(index/schema.py) + two gathers, and a scatter into a fixed [L, max_occs]
buffer. Walk caps replace the reference's unbounded std::vector growth;
with max_occs <= n_seeds_thr the reference's per-genome seed filter can
never trigger, so the cap subsumes it.

Seed splitting (populate_seed:279-305): MEMs with len >= 2*min_len yield
two half-length seeds; the left half walks up from the topmost enumerated
occurrence and down from the bottommost (so it does not re-emit the
parent's occurrences), the right half re-walks from pos+ll. Expressed here
by parametrizing the walk with separate up/down start positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def phi_batch(tables, q):
    """(Phi(q), lcp(q, Phi(q))) for a batch. Callers must mask q == sa0."""
    k = jnp.searchsorted(tables["phi_z"], q, side="left")
    k = jnp.minimum(k, tables["phi_z"].shape[0] - 1)
    z = tables["phi_z"][k]
    return tables["phi_w"][k] - (z - q), tables["phi_wl"][k] + (z - q)


def phi_inv_batch(tables, q):
    """(Phi^-1(q), lcp) for a batch. Callers must mask q == sa_last."""
    k = jnp.searchsorted(tables["phiinv_z"], q, side="left")
    k = jnp.minimum(k, tables["phiinv_z"].shape[0] - 1)
    z = tables["phiinv_z"][k]
    return tables["phiinv_w"][k] - (z - q), tables["phiinv_wl"][k] + (z - q)


@functools.partial(jax.jit, static_argnames=("max_occs",))
def enumerate_occs(tables, up_start, down_start, length, active,
                   include_start, max_occs=64):
    """Occurrences of a seed per lane.

    up_start, down_start, length: int32[L]; active, include_start: bool[L].
    Returns (occs int32[L, max_occs], count int32[L], overflow bool[L]).
    Order matches the reference: start (if included), then the up walk
    (increasingly earlier SA rows), then the down walk."""
    L = up_start.shape[0]
    lanes = jnp.arange(L)
    occs = jnp.zeros((L, max_occs + 1), jnp.int32)
    cnt = jnp.zeros((L,), jnp.int32)

    put = include_start & active & (length > 0)
    occs = occs.at[lanes, jnp.where(put, 0, max_occs)].set(
        jnp.where(put, up_start, 0))
    cnt = cnt + put.astype(jnp.int32)

    def walk(occs, cnt, start, step_fn, boundary):
        def cond(s):
            return jnp.any(s[3])

        def body(s):
            occs, cnt, cur, walking = s
            nxt, lcp = step_fn(tables, cur)
            ok = walking & (lcp >= length) & (cur != boundary) & (cnt < max_occs)
            slot = jnp.where(ok, cnt, max_occs)
            occs = occs.at[lanes, slot].set(
                jnp.where(ok, nxt, occs[lanes, slot]))
            cnt = cnt + ok.astype(jnp.int32)
            return occs, cnt, jnp.where(ok, nxt, cur), ok

        occs, cnt, _, _ = jax.lax.while_loop(
            cond, body, (occs, cnt, start, active & (length > 0)))
        return occs, cnt

    occs, cnt = walk(occs, cnt, up_start, phi_batch, tables["sa0"])
    occs, cnt = walk(occs, cnt, down_start, phi_inv_batch, tables["sa_last"])
    return occs[:, :max_occs], cnt, cnt >= max_occs


def _farthest(tables, step_fn, boundary, start, length, active, max_steps):
    """Last position of a capped Phi walk (find_MEM_above's occs.back())."""

    def cond(s):
        return jnp.any(s[1])

    def body(s):
        cur, walking, steps = s
        nxt, lcp = step_fn(tables, cur)
        ok = walking & (lcp >= length) & (cur != boundary) & (steps < max_steps)
        return jnp.where(ok, nxt, cur), ok, steps + 1

    cur, _, _ = jax.lax.while_loop(
        cond, body, (start, active, jnp.zeros_like(start)))
    return cur


@functools.partial(jax.jit, static_argnames=("max_occs", "min_len"))
def populate_seeds_batch(tables, mem_ptr, mem_len, mem_idx, mem_count,
                         max_occs=64, min_len=25):
    """MEMs [B, K] -> seeds [B, 3K] with occurrence lists.

    Seed slot layout: [0,K) the MEMs; [K,2K) left halves; [2K,3K) right
    halves (halves active only when len >= 2*min_len). rpos for chaining
    is idx + len - 1 for every seed (the reference's rl/rr expressions
    reduce to this). Returns dict of [B, 3K] / [B, 3K, max_occs] arrays."""
    B, K = mem_ptr.shape
    f = lambda x: x.reshape(-1)
    valid = f(jnp.arange(K)[None, :] < mem_count[:, None])
    ptr, mlen, midx = f(mem_ptr), f(mem_len), f(mem_idx)
    ones = jnp.ones((B * K,), bool)

    occs, cnt, _ = enumerate_occs(tables, ptr, ptr, mlen, valid, ones,
                                  max_occs)

    split = valid & (mlen >= 2 * min_len)
    ll = mlen >> 1
    lr = mlen - ll
    upper = _farthest(tables, phi_batch, tables["sa0"], ptr, mlen, split,
                      max_occs)
    lower = _farthest(tables, phi_inv_batch, tables["sa_last"], ptr, mlen,
                      split, max_occs)

    locc, lcnt, _ = enumerate_occs(tables, upper, lower, ll, split, ones,
                                   max_occs)
    rocc, rcnt, _ = enumerate_occs(tables, ptr + ll, ptr + ll, lr, split,
                                   ones, max_occs)

    def cat1(a, b, c):
        return jnp.concatenate(
            [a.reshape(B, K), b.reshape(B, K), c.reshape(B, K)], axis=1)

    def cat2(a, b, c):
        return jnp.concatenate([a.reshape(B, K, max_occs),
                                b.reshape(B, K, max_occs),
                                c.reshape(B, K, max_occs)], axis=1)

    seed_cnt = cat1(cnt, jnp.where(split, lcnt, 0), jnp.where(split, rcnt, 0))
    return {
        "occs": cat2(occs, locc, rocc),
        "cnt": seed_cnt,
        "len": cat1(mlen, ll, lr),
        "idx": cat1(midx, midx, midx + ll),
        "valid": cat1(valid, split, split) & (seed_cnt > 0),
    }
