"""Position-range index sharding: the beyond-HBM seed stage.

For indexes whose tables exceed one chip's HBM (parallel/mesh.py), the
big tables — the pos->run map (4 B/position), the fused ``lf8`` rows
(192 B/run), the nibble text rows (0.5 B/char), and the Phi successor
structures — are split into D contiguous ranges, one per device, so
each chip holds ~1/D of the index. Reads stay replicated across the
index mesh (they are tiny); every table gather becomes

    owner-local gather (masked to the shard's row range)
    -> psum over the index axis to assemble the full result

i.e. the routed-gather pattern: every device answers the rows whose
index lands in its range. Compute is NOT parallelized (each device
walks every lane's recurrence — the carried state is global), only
MEMORY is sharded: the configuration exists to make an index fit at
all, not to speed up a fitting one. At 150 steps x (B*4 + B*32) bytes
the LF scan's per-read ICI traffic is ~5.4 KB — three orders below ICI
bandwidth per read at the target rates, so the step stays
gather-latency-bound like the replicated path.

The full seed stage (LF scan + LCE + Phi occurrence walks + packed
wire) and the device extz score pass run over sharded tables by
REUSING the replicated kernels unchanged: ``ShardedArray`` is a
pytree-registered virtual array whose ``__getitem__`` implements the
masked-gather+psum, so ops/ms.py and ops/extz.py execute the same code
inside the shard_map body. Local row offsets are int32 even when the
GLOBAL index exceeds 2^31 positions — global indices ride int64 (x64
mode) while every HBM gather stays int32-addressed, which is what
serves beyond-int32 indexes on the device path (VERDICT r4 next #5).

Correctness is pinned on a virtual CPU mesh against the replicated
kernel (tests/test_shard_index.py: LF bit-parity, full-stage parity,
end-to-end byte-identical SAM); the crossover arithmetic that decides
when to reach for it lives in parallel/mesh.py (choose_table_layout).

Reference scale story being replaced: the reference serves arbitrary n
from one shared-memory index (pipeline/moni.in:195-204 switches to
64-bit binaries); its analog of this module is "buy more RAM".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms import SIGMA
from .mesh import READS_AXIS

AXIS = READS_AXIS  # the 1-D mesh doubles as the index axis


@jax.tree_util.register_pytree_node_class
class ShardedArray:
    """This shard's contiguous rows [lo, hi) of a 1-D-indexed global
    array, behaving like the global array inside a shard_map body:
    __getitem__ masks the gather to ownership and psums over the index
    axis, so every shard observes the full-table gather result. Local
    addressing is int32 regardless of the global index dtype."""

    def __init__(self, local, lo, hi, glen):
        self.local, self.lo, self.hi, self.glen = local, lo, hi, glen

    @property
    def shape(self):
        return (self.glen,) + tuple(self.local.shape[1:])

    @property
    def dtype(self):
        return self.local.dtype

    def __getitem__(self, idx):
        own = (idx >= self.lo) & (idx < self.hi)
        il = jnp.where(own, idx - self.lo, 0).astype(jnp.int32)
        part = self.local[il]
        if part.dtype in (jnp.uint8, jnp.int8):
            part = part.astype(jnp.int32)   # psum-friendly accumulator
        m = own
        while m.ndim < part.ndim:
            m = m[..., None]
        return jax.lax.psum(jnp.where(m, part, jnp.zeros((), part.dtype)),
                            AXIS)

    def tree_flatten(self):
        return (self.local, self.lo, self.hi), (self.glen,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])


# fused-layout tables that shard by contiguous row range; everything
# else (F32, scalars) replicates
SHARD_KEYS = ("run_idx", "lf8", "text_nibr", "phi_kblk", "phi_kd_u8",
              "phi3", "phiinv_kblk", "phiinv_kd_u8", "phiinv3")


def shard_seed_tables(host, n_shards):
    """Fused-layout host dict (ops/ms.prepare_tables_host) -> sharded
    host dict: every SHARD_KEYS table cut into n_shards contiguous row
    ranges (leading axis = shard, zero-padded to the largest slice),
    plus per-table lo/hi range vectors and replicated leftovers.
    lf8 cuts at run granularity (its index is run * SIGMA + char)."""
    out = {"__shards__": int(n_shards), "__glen__": {}}
    for k, v in host.items():
        if k not in SHARD_KEYS:
            out[k] = v
            continue
        v = np.asarray(v)
        glen = v.shape[0]
        if k == "lf8":
            rcuts = np.linspace(0, glen // SIGMA,
                                n_shards + 1).astype(np.int64)
            cuts = rcuts * SIGMA
        else:
            cuts = np.linspace(0, glen, n_shards + 1).astype(np.int64)
        w = int(np.max(np.diff(cuts))) or 1
        loc = np.zeros((n_shards, w) + v.shape[1:], v.dtype)
        for s in range(n_shards):
            lo, hi = cuts[s], cuts[s + 1]
            loc[s, : hi - lo] = v[lo:hi]
        idt = np.int64 if glen > 2**31 - 1 else np.int32
        out[k + "__loc"] = loc
        out[k + "__lo"] = cuts[:-1].astype(idt)
        out[k + "__hi"] = cuts[1:].astype(idt)
        out["__glen__"][k] = glen
    return out


def stage_sharded(mesh, sh_host):
    """Sharded host dict -> device pytree with slice tables laid out
    along the mesh axis and leftovers replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    dev = {}
    for k, v in sh_host.items():
        if k in ("__shards__", "__glen__"):
            dev[k] = v
        elif k.endswith(("__loc", "__lo", "__hi")):
            dev[k] = jax.device_put(v, NamedSharding(mesh, P(AXIS)))
        elif hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:
            dev[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            dev[k] = v
    return dev


def _assemble(sliced, rep, glens):
    """Inside a shard_map body: rebuild a kernel-compatible table dict
    with ShardedArray views over this shard's slices."""
    tables = dict(rep)
    for k, glen in glens.items():
        tables[k] = ShardedArray(sliced[k + "__loc"][0],
                                 sliced[k + "__lo"][0],
                                 sliced[k + "__hi"][0], glen)
    return tables


def make_sharded_seed_stage(mesh, dev_tables, max_mems, min_len,
                            work_per_read, max_occs, W, occ_cap,
                            occs_work=8):
    """Compiled callable (lanes, lens2) -> (seeds, wire) running the
    FULL seed stage (find_mems + populate_seeds + pack) with every big
    table position-range-sharded over `mesh`. Results are replicated
    (identical on every shard) and bit-identical to the fused
    single-device stage."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..ops.ms import find_mems_batch
    from ..ops.occs import populate_seeds_batch, pack_seeds_wire
    glens = dev_tables["__glen__"]
    sliced = {k: v for k, v in dev_tables.items()
              if k.endswith(("__loc", "__lo", "__hi"))}
    rep = {k: v for k, v in dev_tables.items()
           if not k.endswith(("__loc", "__lo", "__hi"))
           and k not in ("__shards__", "__glen__")}

    def body(sliced, rep, lanes_r, lens_r):
        tables = _assemble(sliced, rep, glens)
        *mems, mctr = find_mems_batch(
            tables, lanes_r, lens_r, max_mems=max_mems, min_len=min_len,
            work_per_read=work_per_read)
        seeds = populate_seeds_batch(tables, *mems, max_occs=max_occs,
                                     min_len=min_len, occs_work=occs_work)
        ctrs = jnp.stack([mctr["lce_dropped"], mctr["mem_dropped"],
                          seeds.pop("occ_capped"),
                          seeds.pop("work_dropped")])
        wire = pack_seeds_wire(seeds, W=W, occ_cap=occ_cap, ctrs=ctrs)
        return seeds, wire

    sspec = {k: P(AXIS) for k in sliced}
    rspec = {k: P() for k in rep}
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(sspec, rspec, P(), P()),
        out_specs=(jax.tree_util.tree_map(lambda _: P(),
                                          {"occs": 0, "cnt": 0, "len": 0,
                                           "idx": 0, "valid": 0}), P()),
        check_vma=False))
    rep_sh = NamedSharding(mesh, P())

    def run(lanes, lens2):
        lanes_dev = jax.device_put(jnp.asarray(lanes), rep_sh)
        seeds, wire = fn(sliced, rep, lanes_dev,
                         jax.device_put(jnp.asarray(lens2), rep_sh))
        return seeds, wire, lanes_dev
    return run


def make_sharded_extz(mesh, dev_tables):
    """Compiled-score function for ops/extz.dispatch_extz_jobs with the
    nibble text rows position-range-sharded: same signature as
    extz_score_fused (the text argument is ignored — the sharded rows
    are bound here)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..ops.extz import extz_score_fused
    glen = dev_tables["__glen__"]["text_nibr"]
    tl = dev_tables["text_nibr__loc"]
    lo = dev_tables["text_nibr__lo"]
    hi = dev_tables["text_nibr__hi"]
    rep_sh = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit, static_argnames=("QMAX", "TMAX", "sm", "sx", "go", "ge"))
    def fn(tl, lo, hi, lanes_r, jobs7, QMAX, TMAX, sm, sx, go, ge):
        def body(tl, lo, hi, lanes_r, jobs7):
            t = ShardedArray(tl[0], lo[0], hi[0], glen)
            return extz_score_fused(t, lanes_r, jobs7, QMAX=QMAX,
                                    TMAX=TMAX, sm=sm, sx=sx, go=go,
                                    ge=ge)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False)(
            tl, lo, hi, lanes_r, jobs7)

    def score(_text, lanes, jobs7, QMAX, TMAX, sm, sx, go, ge):
        return fn(tl, lo, hi, jax.device_put(lanes, rep_sh),
                  jax.device_put(jobs7, rep_sh), QMAX, TMAX, sm, sx,
                  go, ge)
    return score


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
