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

MS lengths exploit the exact suffix-shift identity of the reference's
find_mems skip (include/aligner/seed_finder.hpp:141,163): only jump
positions need a real LCE; they are compacted into a fixed worklist and
extended in LCE_CHUNK-wide vector gathers (see ms_lengths_batch).
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


LCE_CHUNK = 16        # chars compared per LCE round
DEFAULT_MAX_JUMPS = 48  # LCE worklist slots per read (see docstring)


@functools.partial(jax.jit, static_argnames=("max_jumps",))
def ms_lengths_batch(tables, reads, read_lens, ptr,
                     max_jumps=DEFAULT_MAX_JUMPS):
    """MS lengths from pointers.

    Key identity (reference find_mems skip, seed_finder.hpp:141/163):
    when ptr[i] == ptr[i-1] + 1 the match at i is the suffix-shift of
    the match at i-1, so len[i] = len[i-1] - 1 *exactly*. Only "jump"
    positions need a real LCE against the text. Those are compacted
    into a fixed [B, max_jumps] worklist and extended LCE_CHUNK chars
    per round (one big vector gather per round instead of one tiny
    gather per extended char), then a cheap scan propagates the shift
    identity. Reads with more than max_jumps jump positions (a mismatch
    every ~6bp — junk DNA) get underestimated lengths for the overflow
    tail, which cannot produce >= min_len MEMs anyway.

    returns lens int32[B, M]."""
    B, M = reads.shape
    text = tables["text"]
    n = tables["n"]

    prev_ptr = jnp.pad(ptr, ((0, 0), (1, 0)), constant_values=-2)[:, :M]
    valid = jnp.arange(M)[None, :] < read_lens[:, None]
    needy = (ptr != prev_ptr + 1) & valid

    # compact needy positions into [B, max_jumps] slots (overflow dropped)
    slot = jnp.cumsum(needy.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(needy & (slot < max_jumps), slot, max_jumps)
    rows = jnp.arange(B)[:, None].repeat(M, 1)
    cols = jnp.arange(M)[None, :].repeat(B, 0)
    wpos = jnp.zeros((B, max_jumps + 1), jnp.int32).at[rows, slot].set(
        cols, mode="drop")[:, :max_jumps]
    wcount = jnp.sum(needy, axis=1)
    wactive = jnp.arange(max_jumps)[None, :] < \
        jnp.minimum(wcount, max_jumps)[:, None]
    wptr = jnp.take_along_axis(ptr, wpos, axis=1)

    # chunked LCE on the worklist
    lanes = jnp.arange(B)[:, None]
    d = jnp.arange(LCE_CHUNK)[None, None, :]

    def cond(state):
        _, ext, _ = state
        return jnp.any(ext)

    def body(state):
        l, ext, r = state
        roff = wpos[:, :, None] + l[:, :, None] + d      # read offsets
        toff = wptr[:, :, None] + l[:, :, None] + d
        rin = roff < read_lens[:, None, None]
        tin = toff < n
        rch = reads[lanes[:, :, None].repeat(max_jumps, 1),
                    jnp.clip(roff, 0, M - 1)]
        tch = text[jnp.clip(toff, 0, n - 1)].astype(jnp.int32)
        eq = rin & tin & (rch == tch)
        neq = ~eq
        anybad = jnp.any(neq, axis=2)
        firstbad = jnp.argmax(neq, axis=2).astype(jnp.int32)
        add = jnp.where(anybad, firstbad, LCE_CHUNK)
        l = l + jnp.where(ext, add, 0)
        return l, ext & ~anybad, r + 1

    l0 = jnp.zeros((B, max_jumps), jnp.int32)
    wlce, _, _ = jax.lax.while_loop(cond, body, (l0, wactive, 0))

    # scatter LCEs back and propagate the shift identity
    wlanes = jnp.arange(B)[:, None].repeat(max_jumps, 1)
    lce_at = jnp.zeros((B, M + 1), jnp.int32).at[
        wlanes, jnp.where(wactive, wpos, M)].set(
        wlce, mode="drop")[:, :M]

    def prop(carry, xs):
        nd, lc = xs
        out = jnp.where(nd, lc, jnp.maximum(carry - 1, 0))
        return out, out

    _, lens_T = jax.lax.scan(
        prop, jnp.zeros((B,), jnp.int32), (needy.T, lce_at.T))
    lens = lens_T.T
    return jnp.where(valid, lens, 0)


@functools.partial(jax.jit,
                   static_argnames=("max_mems", "min_len", "max_jumps"))
def find_mems_batch(tables, reads, read_lens, max_mems=16, min_len=25,
                    max_jumps=DEFAULT_MAX_JUMPS):
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
    lens = ms_lengths_batch(tables, reads, read_lens, ptr,
                            max_jumps=max_jumps)

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
