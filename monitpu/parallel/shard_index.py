"""Position-range index sharding: the beyond-HBM MS backward search.

The plan of record for indexes whose tables exceed one chip's HBM
(parallel/mesh.py): split the two dominant tables — the pos->run map
(4 B/position) and the fused ``lf8`` rows (192 B/run) — into D
contiguous ranges, one per device, so each chip holds ~1/D of the
index. Reads stay replicated across the index mesh (they are tiny);
each backward step becomes

    owner-local gather (masked to the shard's position/run range)
    -> psum over the index axis to assemble the full row

i.e. the routed-gather pattern: every device answers the sub-batch of
lanes whose current BWT position lands in its range, and the psum of
one [B]-int32 and one [B, 8]-int32 vector per step rides the ICI.
Compute is NOT parallelized (each device walks every lane's recurrence
— the carried (pos, sample) state is global), only MEMORY is sharded:
the configuration exists to make an index fit at all, not to speed up
a fitting one. At 150 steps x (B*4 + B*32) bytes the per-read ICI
traffic is ~5.4 KB — three orders below ICI bandwidth per read at the
target rates, so the step stays gather-latency-bound like the
replicated path.

This module is the working prototype of that design: correctness is
pinned on a virtual CPU mesh against the replicated kernel
(tests/test_shard_index.py); the crossover arithmetic that decides
when to reach for it lives in parallel/mesh.py.

Reference scale story being replaced: the reference serves arbitrary n
from one shared-memory index (pipeline/moni.in:195-204 switches to
64-bit binaries); its analog of this module is "buy more RAM".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms import SIGMA
from .mesh import READS_AXIS

AXIS = READS_AXIS  # the prototype reuses the 1-D mesh as the index axis


def shard_lf_tables(host, n_shards):
    """Split a fused-layout host table dict (ops/ms.prepare_tables_host)
    into per-shard LF-step slices.

    Returns a dict of stacked per-shard arrays (leading axis = shard),
    padded to the largest shard so the pytree is rectangular:
      pos_lo int32[D], pos_hi int32[D]   position range per shard
      run_lo int32[D], run_hi int32[D]   run range per shard
      run_idx_loc int32[D, Pmax]         local slice of pos->run
      lf8_loc int32[D, Rmax*SIGMA, 8]    local slice of lf8 rows
    plus replicated scalars (F32, n, sa_last)."""
    n = int(host["n"])
    run_idx = np.asarray(host["run_idx"])
    lf8 = np.asarray(host["lf8"])
    r = lf8.shape[0] // SIGMA
    pos_cuts = np.linspace(0, n, n_shards + 1).astype(np.int64)
    run_cuts = np.linspace(0, r, n_shards + 1).astype(np.int64)
    pmax = int(np.max(np.diff(pos_cuts)))
    rmax = int(np.max(np.diff(run_cuts)))
    d = {
        "pos_lo": np.asarray(pos_cuts[:-1], np.int32),
        "pos_hi": np.asarray(pos_cuts[1:], np.int32),
        "run_lo": np.asarray(run_cuts[:-1], np.int32),
        "run_hi": np.asarray(run_cuts[1:], np.int32),
        "run_idx_loc": np.zeros((n_shards, pmax), np.int32),
        "lf8_loc": np.zeros((n_shards, rmax * SIGMA, 8), np.int32),
        "F32": np.asarray(host["F32"], np.int32),
        "n": np.int32(n),
        "sa_last": np.int32(host["sa_last"]),
    }
    for s in range(n_shards):
        pl, ph = pos_cuts[s], pos_cuts[s + 1]
        rl, rh = run_cuts[s], run_cuts[s + 1]
        d["run_idx_loc"][s, : ph - pl] = run_idx[pl:ph]
        d["lf8_loc"][s, : (rh - rl) * SIGMA] = lf8[rl * SIGMA: rh * SIGMA]
    return d


def _sharded_step(local, F, n, pos, sample, c):
    """One masked-gather + psum backward step (see module docstring).
    local: this shard's slice dict entries (leading shard axis already
    consumed by shard_map)."""
    count_c = F[c + 1] - F[c]
    own_p = (pos >= local["pos_lo"]) & (pos < local["pos_hi"])
    pl = jnp.where(own_p, pos - local["pos_lo"], 0)
    j_part = jnp.where(own_p, local["run_idx_loc"][pl], 0)
    j = jax.lax.psum(j_part, AXIS)

    own_r = (j >= local["run_lo"]) & (j < local["run_hi"])
    jl = jnp.where(own_r, j - local["run_lo"], 0)
    row_part = jnp.where(own_r[:, None],
                         local["lf8_loc"][jl * SIGMA + c], 0)
    row = jax.lax.psum(row_part, AXIS)

    rs, head = row[:, 0], row[:, 1]
    clen, rank_runs = row[:, 2], row[:, 3]
    match = head == c
    rank_c_pos = clen + jnp.where(match, pos - rs, 0)
    thr_c = row[:, 4] + (row[:, 5] <= pos).astype(jnp.int32)
    up = rank_runs > thr_c
    csam = jnp.where(up, row[:, 6], row[:, 7])

    count0 = count_c == 0
    jump_up = (~match) & up
    new_pos = jnp.where(
        count0, jnp.minimum(F[c], n - 1),
        F[c] + rank_c_pos - jump_up.astype(jnp.int32))
    new_sample = jnp.where(
        count0, 0, jnp.where(match, sample, csam) - 1)
    return new_pos, new_sample


def ms_pointers_sharded(mesh, sharded_host, reads, read_lens):
    """MS pointers with the index position-range-sharded over `mesh`.

    sharded_host: shard_lf_tables output. reads int32[B, M] and
    read_lens int32[B] are replicated (every device walks every lane).
    Returns ptr int32[B, M], bit-identical to ms_pointers_batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard_map = jax.shard_map
    B, M = reads.shape

    sliced = {k: sharded_host[k] for k in
              ("pos_lo", "pos_hi", "run_lo", "run_hi",
               "run_idx_loc", "lf8_loc")}
    # per-shard slices ride the mesh axis; everything else replicates
    sspec = {k: P(AXIS) for k in sliced}
    F = jnp.asarray(sharded_host["F32"])
    n = jnp.int32(sharded_host["n"])
    sa_last = jnp.int32(sharded_host["sa_last"])

    def body(local, reads_r, lens_r):
        local = {k: v[0] for k, v in local.items()}  # drop shard axis
        pos0 = jnp.full((B,), n - 1, jnp.int32)
        sam0 = jnp.full((B,), sa_last, jnp.int32)

        def step(carry, xs):
            pos, sample = carry
            c, i = xs
            np_, ns_ = _sharded_step(local, F, n, pos, sample, c)
            valid = i < lens_r
            pos = jnp.where(valid, np_, pos)
            sample = jnp.where(valid, ns_, sample)
            return (pos, sample), jnp.where(valid, ns_, 0)

        idxs = jnp.arange(M - 1, -1, -1, dtype=jnp.int32)
        _, ptr_rev = jax.lax.scan(step, (pos0, sam0),
                                  (reads_r.T[::-1], idxs))
        return ptr_rev[::-1].T

    fn = shard_map(body, mesh=mesh,
                   in_specs=(sspec, P(), P()),
                   out_specs=P(),
                   check_vma=False)
    dev = {k: jax.device_put(v, NamedSharding(mesh, P(AXIS)))
           for k, v in sliced.items()}
    return fn(dev, jnp.asarray(reads), jnp.asarray(read_lens))
