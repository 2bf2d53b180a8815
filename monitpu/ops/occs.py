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


from ..index.schema import BLOCK_BITS


def _phi_lookup(tables, q, name):
    """Successor-anchor lookup as 3 gathers: block anchor + uint8 delta
    give the searchsorted result directly (see ms.prepare_tables), then
    one fused 12-byte (z, w, wl) row gather."""
    k = (tables[f"{name}_kblk"][q >> BLOCK_BITS] +
         tables[f"{name}_kd_u8"][q].astype(jnp.int32))
    row = tables[f"{name}3"][jnp.minimum(k, tables[f"{name}3"].shape[0] - 1)]
    z = row[..., 0]
    return row[..., 1] - (z - q), row[..., 2] + (z - q)


def phi_batch(tables, q):
    """(Phi(q), lcp(q, Phi(q))) for a batch. Callers must mask q == sa0."""
    return _phi_lookup(tables, q, "phi")


def phi_inv_batch(tables, q):
    """(Phi^-1(q), lcp) for a batch. Callers must mask q == sa_last."""
    return _phi_lookup(tables, q, "phiinv")


@functools.partial(jax.jit, static_argnames=("max_occs",))
def enumerate_occs(tables, up_start, down_start, length, active,
                   include_start, max_occs=64):
    """Occurrences of a seed per lane.

    up_start, down_start, length: int32[L]; active, include_start: bool[L].
    Returns (occs int32[L, max_occs], count int32[L], far_up int32[L],
    far_down int32[L]). Order matches the reference: start (if
    included), then the up walk (increasingly earlier SA rows), then the
    down walk. far_up / far_down are the last positions each walk
    reached (find_MEM_above/below's occs.back(), seed_finder.hpp:286-292
    — used to seed the left-half walks without re-walking)."""
    L = up_start.shape[0]
    lanes = jnp.arange(L)
    occs = jnp.zeros((L, max_occs + 1), up_start.dtype)
    cnt = jnp.zeros((L,), jnp.int32)

    put = include_start & active & (length > 0)
    occs = occs.at[lanes, jnp.where(put, 0, max_occs)].set(
        jnp.where(put, up_start, 0))
    cnt = cnt + put.astype(jnp.int32)

    P1_ROUNDS = 3   # covers the typical per-direction walk depth (an
    # occurrence list of ~one-per-haplotype splits into up+down walks of
    # a step or two each); deeper walkers fall to the compacted pool, so
    # shrinking this trades rare narrow pool rounds for 2x fewer
    # full-width rounds — the full-width rounds dominated seed-stage
    # profile (tools/profile_seed.py)

    def walk(occs, cnt, start, step_fn, boundary):
        """Two-phase lockstep walk: a fixed number of full-width rounds
        (most seeds have only a few occurrences — one per haplotype),
        then the rare deep walkers (repeat regions heading for the
        max_occs cap) are compacted into a small pool so their ~max_occs
        rounds don't run at full batch width."""
        def step(rows, occs, cnt, cur, walking):
            nxt, lcp = step_fn(tables, cur)
            ok = walking & (lcp >= length[rows]) & (cur != boundary) & \
                (cnt < max_occs)
            slot = jnp.where(ok, cnt, max_occs)
            occs = occs.at[rows, slot].set(jnp.where(ok, nxt, 0),
                                           mode="drop")
            return occs, cnt + ok.astype(jnp.int32), \
                jnp.where(ok, nxt, cur), ok

        def body1(_, s):
            occs, cnt, cur, walking = s
            return step(lanes, occs, cnt, cur, walking)

        occs, cnt, cur, walking = jax.lax.fori_loop(
            0, P1_ROUNDS, body1,
            (occs, cnt, start, active & (length > 0)))

        W2 = max(L // 8, 64)
        src2, act2 = _compact(walking, W2)
        rows2 = jnp.where(act2, src2, L)   # L row of occs is the trash row

        def cond2(s):
            return jnp.any(s[3])

        def body2(s):
            occs, cnt2, cur2, walking2 = s
            return step(rows2, occs, cnt2, cur2, walking2)

        occs2 = jnp.concatenate(
            [occs, jnp.zeros((1, occs.shape[1]), occs.dtype)], axis=0)
        occs2, cnt2, cur2, _ = jax.lax.while_loop(
            cond2, body2, (occs2, cnt[src2], cur[src2], act2))
        occs = occs2[:L]
        cnt = cnt.at[rows2].set(cnt2, mode="drop")
        far = cur.at[rows2].set(cur2, mode="drop")
        return occs, cnt, far

    occs, cnt, far_up = walk(occs, cnt, up_start, phi_batch, tables["sa0"])
    occs, cnt, far_dn = walk(occs, cnt, down_start, phi_inv_batch,
                             tables["sa_last"])
    # cap accounting: a lane that filled all max_occs slots may have
    # been truncated mid-walk (the reference enumerates unboundedly,
    # seed_finder.hpp:169-239) — counted, surfaced via Aligner.stats
    capped = active & (length > 0) & (cnt >= max_occs)
    return occs[:, :max_occs], cnt, far_up, far_dn, capped


from .ms import _compact


def _scatter_rows(src, active, vals, L):
    """Inverse of _compact for row payloads: [W, ...] -> [L, ...]."""
    dest = jnp.where(active, src, L)
    out_shape = (L + 1,) + vals.shape[1:]
    return jnp.zeros(out_shape, vals.dtype).at[dest].set(
        vals, mode="drop")[:L]


@functools.partial(jax.jit,
                   static_argnames=("max_occs", "min_len", "occs_work"))
def populate_seeds_batch(tables, mem_ptr, mem_len, mem_idx, mem_count,
                         max_occs=64, min_len=25, occs_work=8):
    """MEMs [B, K] -> seeds [B, 3K] with occurrence lists.

    Seed slot layout: [0,K) the MEMs; [K,2K) left halves; [2K,3K) right
    halves (halves active only when len >= 2*min_len). rpos for chaining
    is idx + len - 1 for every seed (the reference's rl/rr expressions
    reduce to this). Returns dict of [B, 3K] / [B, 3K, max_occs] arrays.

    Valid MEMs (typically a handful of the K slots) are compacted into a
    flat occs_work*B-lane worklist before the Phi walks so lockstep walk
    rounds only pay for real seeds; left/right half-seeds ride a second
    (occs_work//2)*B-lane worklist seeded by the parent walks' far
    endpoints. Overflow of EITHER worklist drops seeds and is COUNTED
    (``work_dropped``) so the aligner's exact-retry can resize
    occs_work — round 5 found the former silent W2 cliff dropping
    half-seeds on orientation-skewed PE lanes."""
    B, K = mem_ptr.shape
    L = B * K
    f = lambda x: x.reshape(-1)
    valid = f(jnp.arange(K)[None, :] < mem_count[:, None])
    ptr, mlen, midx = f(mem_ptr), f(mem_len), f(mem_idx)

    # ---- worklist 1: parent MEMs ----
    W1 = occs_work * B
    src1, act1 = _compact(valid, W1)
    dropped1 = jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - W1, 0)
    onesW = jnp.ones((W1,), bool)
    occs_w, cnt_w, fup_w, fdn_w, cap_w = enumerate_occs(
        tables, ptr[src1], ptr[src1], mlen[src1], act1, onesW, max_occs)
    upper = _scatter_rows(src1, act1, fup_w, L)
    lower = _scatter_rows(src1, act1, fdn_w, L)
    valid = valid & _scatter_rows(src1, act1, act1, L)   # drop overflow

    # ---- worklist 2: half seeds (left + right jobs concatenated) ----
    split = valid & (mlen >= 2 * min_len)
    ll = mlen >> 1
    lr = mlen - ll
    W2 = max(occs_work // 2, 2) * B
    dropped2 = jnp.maximum(
        2 * jnp.sum(split.astype(jnp.int32)) - W2, 0)
    src2, act2 = _compact(jnp.concatenate([split, split]), W2)
    is_left = src2 < L
    p = jnp.where(is_left, src2, src2 - L)
    # left-half down start = the parent's LAST ENUMERATED occurrence
    # (seed_finder.hpp:288: occs.back() after find_MEM_below) — the down
    # walk's far point if it stepped, else the up walk's far point, else
    # the start position itself.
    lower_eff = jnp.where(lower != ptr, lower, upper)
    h_up = jnp.where(is_left, upper[p], ptr[p] + ll[p])
    h_dn = jnp.where(is_left, lower_eff[p], ptr[p] + ll[p])
    h_len = jnp.where(is_left, ll[p], lr[p])
    hocc_w, hcnt_w, _, _, hcap_w = enumerate_occs(
        tables, h_up, h_dn, h_len, act2, jnp.ones((W2,), bool), max_occs)

    # both worklists scatter STRAIGHT into the final [B, 3K] slot layout
    # (parents [0,K), left halves [K,2K), right halves [2K,3K)) — no
    # intermediate flat buffers, no reshape/transpose materializations
    S = 3 * K
    F = B * S           # flat output size; index F = trash slot

    def dest_of(pp, off):
        return (pp // K) * S + (pp % K) + off

    dest1 = jnp.where(act1, dest_of(src1, 0), F)
    dest2 = jnp.where(act2, dest_of(p, jnp.where(is_left, K, 2 * K)), F)

    occs_o = (jnp.zeros((F + 1, max_occs), occs_w.dtype)
              .at[dest1].set(occs_w, mode="drop")
              .at[dest2].set(hocc_w, mode="drop"))[:F]

    def scat(v1, v2, dtype=jnp.int32):
        return (jnp.zeros((F + 1,), dtype)
                .at[dest1].set(v1.astype(dtype), mode="drop")
                .at[dest2].set(v2.astype(dtype), mode="drop"))[:F]

    cnt_o = scat(cnt_w, hcnt_w)
    occ_capped = (jnp.sum(cap_w & act1) + jnp.sum(hcap_w & act2)).astype(
        jnp.int32)
    return {
        "occ_capped": occ_capped,
        "work_dropped": (dropped1 + dropped2).astype(jnp.int32),
        "occs": occs_o.reshape(B, S, max_occs),
        "cnt": cnt_o.reshape(B, S),
        "len": scat(mlen[src1], h_len, mlen.dtype).reshape(B, S),
        "idx": scat(midx[src1],
                    jnp.where(is_left, midx[p], midx[p] + ll[p]),
                    midx.dtype).reshape(B, S),
        "valid": (scat(act1, act2, bool).reshape(B, S)
                  & (cnt_o.reshape(B, S) > 0)),
    }


@functools.partial(jax.jit, static_argnames=("W", "occ_cap"))
def pack_seeds(seeds, W, occ_cap):
    """Compact the dense seed arrays [R(=2B), S, O] into a transfer-
    friendly ragged layout: one record per VALID seed (sorted by
    (row, slot)) plus a flat occurrence pool. Cuts the device->host
    transfer from O(R*S*O) to O(actual seeds + occs) — the dense form
    is ~97% padding on typical read batches, and the host link is the
    bottleneck under the TPU tunnel.

    Returns dict(row, slot, len, idx, cnt, off int32[W]; occ
    int32[occ_cap]; n_valid, n_occ int32 scalars). Slots beyond the
    valid count have row == R (sentinel). n_valid > W or n_occ >
    occ_cap signals overflow — callers must fall back to the dense
    arrays (Aligner._complete_native does, counting the event)."""
    occs, cnt = seeds["occs"], seeds["cnt"]
    R, S, O = occs.shape
    v = seeds["valid"].reshape(-1)
    src, act = _compact(v, W)
    cflat = cnt.reshape(-1)
    cw = jnp.where(act, cflat[src], 0)
    off = jnp.cumsum(cw) - cw
    eff = jnp.clip(jnp.minimum(cw, occ_cap - off), 0, None)
    pos = off[:, None] + jnp.arange(O, dtype=jnp.int32)[None, :]
    ok = jnp.arange(O)[None, :] < eff[:, None]
    occ_flat = jnp.zeros((occ_cap + 1,), occs.dtype).at[
        jnp.where(ok, pos, occ_cap)].set(
        occs.reshape(-1, O)[src], mode="drop")[:occ_cap]
    take = lambda name: jnp.where(
        act, seeds[name].reshape(-1)[src], 0).astype(jnp.int32)
    return {
        "row": jnp.where(act, src // S, R).astype(jnp.int32),
        "slot": (src % S).astype(jnp.int32),
        "len": take("len"),
        "idx": take("idx"),
        "cnt": eff.astype(jnp.int32),
        "off": off.astype(jnp.int32),
        "occ": occ_flat,
        "n_valid": jnp.sum(v.astype(jnp.int32)),
        "n_occ": jnp.sum(jnp.where(v, cflat, 0)),
    }


@functools.partial(jax.jit, static_argnames=("W", "occ_cap"))
def pack_seeds_wire(seeds, W, occ_cap, ctrs=None):
    """pack_seeds flattened into ONE int32 wire vector for a single
    device->host pull: the tunnel charges ~25 ms latency PER transfer
    (measured), so per-key pulls cost more than the payload. Layout:
    [n_valid, n_occ, lce_dropped, mem_dropped, occ_capped, work_dropped,
    row*S+slot (W), len<<16|idx (W), cnt (W), occ (occ_cap)]. The
    truncation counters ride the header so no separate counter pull is
    needed. 'off' is recomputable host-side (cumsum of cnt — identical
    when no occ clipping happened; clipping implies n_occ > occ_cap
    which forces the dense fallback anyway)."""
    p = pack_seeds(seeds, W=W, occ_cap=occ_cap)
    S = seeds["len"].shape[1]
    if ctrs is None:
        ctrs = jnp.zeros((WIRE_HDR - 2,), jnp.int32)
    wt = p["occ"].dtype    # int64 wire on beyond-int32 indexes
    return jnp.concatenate([
        p["n_valid"].reshape(1).astype(wt), p["n_occ"].reshape(1).astype(wt),
        ctrs.astype(wt).reshape(WIRE_HDR - 2),
        (p["row"] * S + p["slot"]).astype(wt),
        ((p["len"] << 16) | p["idx"]).astype(wt),
        p["cnt"].astype(wt),
        p["occ"],
    ])


WIRE_HDR = 6   # n_valid, n_occ, lce/mem/occ-cap/work counters


def unpack_seeds_wire(buf, W, occ_cap, S):
    """numpy inverse of pack_seeds_wire -> (pack_seeds-style dict | None
    on overflow — caller falls back to the dense arrays, ctrs int32[3])."""
    import numpy as np
    n_valid, n_occ = int(buf[0]), int(buf[1])
    ctrs = np.asarray(buf[2:WIRE_HDR], np.int64)
    if n_valid > W or n_occ > occ_cap:
        return None, ctrs
    o = WIRE_HDR
    a = buf[o:o + n_valid]
    b = buf[o + W:o + W + n_valid]
    cnt = np.ascontiguousarray(buf[o + 2 * W:o + 2 * W + n_valid])
    occ = np.ascontiguousarray(buf[o + 3 * W:o + 3 * W + n_occ])
    off = np.zeros(n_valid, np.int32)
    if n_valid:
        off[1:] = np.cumsum(cnt[:-1])
    return {
        "row": np.ascontiguousarray(a // S), "slot": np.ascontiguousarray(a % S),
        "len": np.ascontiguousarray(b >> 16),
        "idx": np.ascontiguousarray(b & 0xFFFF),
        "cnt": cnt, "off": off, "occ": occ,
        "n_valid": np.int32(n_valid), "n_occ": np.int32(n_occ), "S": S,
    }, ctrs


@functools.partial(jax.jit, static_argnames=(
    "max_mems", "min_len", "work_per_read", "max_occs", "W", "occ_cap",
    "occs_work"))
def seed_stage_fused(tables, lanes, lens2, max_mems, min_len,
                     work_per_read, max_occs, W, occ_cap, occs_work=8):
    """find_mems + populate_seeds + pack_seeds_wire as ONE jitted
    program: a single device dispatch instead of three. Under the
    remote tunnel each dispatch pays a fixed round-trip (~10-25 ms);
    fusing the seed stage removes two of them per batch (the sharded
    path already fuses inside its shard_map body)."""
    from .ms import find_mems_batch
    *mems, mctr = find_mems_batch(tables, lanes, lens2,
                                  max_mems=max_mems, min_len=min_len,
                                  work_per_read=work_per_read)
    seeds = populate_seeds_batch(tables, *mems, max_occs=max_occs,
                                 min_len=min_len, occs_work=occs_work)
    ctrs = jnp.stack([mctr["lce_dropped"], mctr["mem_dropped"],
                      seeds.pop("occ_capped"),
                      seeds.pop("work_dropped")])
    wire = pack_seeds_wire(seeds, W=W, occ_cap=occ_cap, ctrs=ctrs)
    return seeds, wire
