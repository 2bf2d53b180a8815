"""Batched matching-statistics backward search on TPU.

TPU-native re-design of the reference's per-read scalar loop
(include/ms/moni.hpp:567-624, the "HOT LOOP 1" of SURVEY.md §3.2):

- the per-read loop is inherently sequential (loop-carried BWT position
  and SA sample), so the TPU win is *width*: one lax.scan over pattern
  positions carries (pos, sample) for a whole batch of reads at once and
  every inner operation is a batched gather into the flat index tables;
- rank/select/threshold queries that the reference answers with succinct
  bitvector machinery are O(1) gathers here (see index/schema.py): the
  only search left is run-of-position, a <=7-step bounded binary search
  inside a 64-position block;
- everything is branchless: match / jump-up / jump-down / absent-char
  lanes are computed together and blended with jnp.where.

MS lengths are recovered with the carry trick of the reference's
find_mems (include/aligner/seed_finder.hpp:138-147): a second scan over
read positions carries the running match length; a nested while_loop
extends all still-matching lanes one text gather per char. Total gathers
are proportional to sum of length increments (~2 per position) instead
of readlen per position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..index.schema import BLOCK_BITS

SIGMA = 6


def _run_of_position(tables, pos):
    """Largest j with run_starts[j] <= pos. pos: int32[B]."""
    block_run = tables["block_run"]
    run_starts = tables["run_starts"]
    b = pos >> BLOCK_BITS
    lo = block_run[b]
    hi = block_run[b + 1]
    # invariant: run_starts[lo] <= pos < run_starts[hi+1]
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi + 1) >> 1
        go = run_starts[mid] <= pos
        return jnp.where(go, mid, lo), jnp.where(go, hi, mid - 1)
    # block spans at most 64 positions -> at most 65 candidate runs
    lo, hi = jax.lax.fori_loop(0, 7, body, (lo, hi))
    return lo


def ms_step(tables, pos, sample, c):
    """One backward step for a batch: returns (new_pos, new_sample).

    Mirrors moni.hpp:579-621 case analysis, branchless."""
    F = tables["F32"]            # int32[SIGMA+1]
    count_c = F[c + 1] - F[c]
    j = _run_of_position(tables, pos)
    head = tables["run_heads"][j].astype(jnp.int32)
    rs = tables["run_starts"][j]
    flat = j * SIGMA + c
    clen = tables["clen_at_run_flat"][flat]
    match = head == c
    rank_c_pos = clen + jnp.where(match, pos - rs, 0)

    # jump path (BWT[pos] != c): threshold decides up vs down
    rank_runs = tables["run_crank_flat"][flat]
    thr_c = tables["thr_cnt_run_flat"][flat] + \
        (tables["thr_pos_run_flat"][flat] <= pos).astype(jnp.int32)
    up = rank_runs > thr_c
    k = rank_runs - up.astype(jnp.int32)
    # csamples: [2, SIGMA, Rc_max] stacked (start, last); select via `up`
    csam = tables["csamples"][
        up.astype(jnp.int32), c, jnp.clip(k, 0, tables["csamples"].shape[2] - 1)]

    n = tables["n"]
    count0 = count_c == 0
    jump_up = (~match) & up
    new_pos = jnp.where(
        count0, jnp.minimum(F[c], n - 1),
        F[c] + rank_c_pos - jump_up.astype(jnp.int32))
    new_sample = jnp.where(
        count0, 0, jnp.where(match, sample, csam) - 1)
    return new_pos, new_sample


@jax.jit
def ms_pointers_batch(tables, reads, read_lens):
    """MS pointers for a padded batch.

    reads: int32[B, M] (code alphabet, left-aligned, pad arbitrary)
    read_lens: int32[B]
    returns ptr int32[B, M] (0 outside the read)."""
    B, M = reads.shape
    n = tables["n"]
    pos0 = jnp.full((B,), n - 1, dtype=jnp.int32)
    sample0 = jnp.full((B,), tables["sa_last"], dtype=jnp.int32)

    reads_T = reads.T  # [M, B] for scan

    def step(carry, xs):
        pos, sample = carry
        c, i = xs
        new_pos, new_sample = ms_step(tables, pos, sample, c)
        valid = i < read_lens
        pos = jnp.where(valid, new_pos, pos)
        sample = jnp.where(valid, new_sample, sample)
        return (pos, sample), jnp.where(valid, new_sample, 0)

    idxs = jnp.arange(M - 1, -1, -1, dtype=jnp.int32)
    (_, _), ptr_rev = jax.lax.scan(
        step, (pos0, sample0), (reads_T[::-1], idxs))
    return ptr_rev[::-1].T  # [B, M]


@jax.jit
def ms_lengths_batch(tables, reads, read_lens, ptr):
    """MS lengths from pointers via carried extension (find_mems carry).

    returns lens int32[B, M]."""
    B, M = reads.shape
    text = tables["text"]
    n = tables["n"]
    # reads padded on the right with an out-of-alphabet value so that
    # extension never runs past the true read; use length masks instead.
    ptr_T = ptr.T
    reads_cols = reads.T

    def outer(carry, xs):
        l, prev_ptr = carry
        p, i = xs  # p: int32[B] pointer at position i
        skip = p == prev_ptr + 1

        def cond(state):
            l, extending = state
            return jnp.any(extending)

        def body(state):
            l, extending = state
            rpos = i + l
            tpos = p + l
            ok = extending & (rpos < read_lens) & (tpos < n)
            rchar = reads[jnp.arange(B), jnp.clip(rpos, 0, M - 1)]
            tchar = text[jnp.clip(tpos, 0, n - 1)].astype(jnp.int32)
            ok = ok & (rchar == tchar)
            return jnp.where(ok, l + 1, l), ok

        l2, _ = jax.lax.while_loop(cond, body, (l, ~skip & (i < read_lens)))
        out = l2
        new_l = jnp.maximum(l2 - 1, 0)
        return (new_l, p), out

    idxs = jnp.arange(M, dtype=jnp.int32)
    init = (jnp.zeros((B,), jnp.int32), jnp.full((B,), -2, jnp.int32))
    (_, _), lens_T = jax.lax.scan(outer, init, (ptr_T, idxs))
    lens = lens_T.T
    mask = jnp.arange(M)[None, :] < read_lens[:, None]
    return jnp.where(mask, lens, 0)


@functools.partial(jax.jit, static_argnames=("max_mems", "min_len"))
def find_mems_batch(tables, reads, read_lens, max_mems=16, min_len=25):
    """MEMs per read: positions where the match is maximal
    (seed_finder.hpp:149-157: l >= pl, not all-N, l >= min_len).

    Returns (mem_ptr, mem_len, mem_idx, mem_count):
      mem_ptr  int32[B, max_mems]   text position
      mem_len  int32[B, max_mems]
      mem_idx  int32[B, max_mems]   read offset
      mem_count int32[B]            (clipped at max_mems)
    MEMs are emitted left-to-right; overflow beyond max_mems is dropped
    (counted in mem_count clip)."""
    B, M = reads.shape
    ptr = ms_pointers_batch(tables, reads, read_lens)
    lens = ms_lengths_batch(tables, reads, read_lens, ptr)

    prev_lens = jnp.pad(lens, ((0, 0), (1, 0)))[:, :M]
    is_mem = (lens >= prev_lens) & (lens >= min_len)
    # all-N suppression: count of N codes in read[i:i+l] == l
    is_n = (reads == 5).astype(jnp.int32)
    ncum = jnp.pad(jnp.cumsum(is_n, axis=1), ((0, 0), (1, 0)))
    cols = jnp.arange(M)[None, :]
    end = jnp.clip(cols + lens, 0, M)
    n_in_mem = jnp.take_along_axis(ncum, end, axis=1) - \
        jnp.take_along_axis(ncum, cols + jnp.zeros_like(lens), axis=1)
    is_mem = is_mem & (n_in_mem < lens)
    mask = cols < read_lens[:, None]
    is_mem = is_mem & mask

    slot = jnp.cumsum(is_mem.astype(jnp.int32), axis=1) - 1
    mem_count = jnp.minimum(slot[:, -1] + 1, max_mems)
    slot = jnp.where(is_mem & (slot < max_mems), slot, max_mems)  # drop lane
    rows = jnp.arange(B)[:, None].repeat(M, 1)
    mem_ptr = jnp.zeros((B, max_mems + 1), jnp.int32).at[rows, slot].set(
        ptr, mode="drop")[:, :max_mems]
    mem_len = jnp.zeros((B, max_mems + 1), jnp.int32).at[rows, slot].set(
        lens, mode="drop")[:, :max_mems]
    mem_idx = jnp.zeros((B, max_mems + 1), jnp.int32).at[rows, slot].set(
        cols + jnp.zeros_like(lens), mode="drop")[:, :max_mems]
    return mem_ptr, mem_len, mem_idx, mem_count


def prepare_tables(index):
    """MoniIndex -> device table pytree consumed by the kernels."""
    d = index.device_tables()
    d["F32"] = jnp.asarray(index.F, dtype=jnp.int32)
    d["clen_at_run_flat"] = d.pop("clen_at_run").reshape(-1)
    d["run_crank_flat"] = d.pop("run_crank").reshape(-1)
    d["thr_cnt_run_flat"] = d.pop("thr_cnt_run").reshape(-1)
    d["thr_pos_run_flat"] = d.pop("thr_pos_run").reshape(-1)
    d["csamples"] = jnp.stack([d.pop("csamples_start"), d.pop("csamples_last")])
    return d
