"""Serve the bigbuild (>2^31-position) index on the DEVICE path via
position-range sharding — the real-scale companion to
tests/test_shard_index_wide.py (which pins the same code path
dtype-driven at test scale).

Runs on a virtual CPU mesh under JAX x64 (no pod needed): global
indices ride int64, every HBM gather is int32-addressed into a
shard-local slice. Memory discipline matters more than speed here —
the host has to hold the derived tables AND their device copies — so
this tool:

  * lazy-loads index fields straight from the stream-built npz
    (ZIP_STORED: each field reads from disk on access, nothing else
    resident),
  * derives the fused tables one at a time,
  * stages each table shard-by-shard with
    jax.make_array_from_single_device_arrays and frees the host copy
    immediately (no padded [D, w] host duplicate).

It then runs the sharded seed stage on sampled reads and checks the
packed seeds byte-for-byte against the 64-bit CPU engine's
(native/cpuseeds.cpp) — the same engine whose full-SAM parity the
wide test pins.

Usage:
  JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python tools/bigserve.py [n_reads]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PREFIX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "bigbuild")
T0 = time.time()


def log(*a):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[{time.time()-T0:7.1f}s rss={rss:5.1f}G]", *a, flush=True)


def main():
    assert os.environ.get("JAX_ENABLE_X64"), "run with JAX_ENABLE_X64=1"
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    devs = jax.devices()
    D = len(devs)
    log(f"{D} devices, x64={jax.config.jax_enable_x64}")

    import json
    meta = json.loads(open(PREFIX + ".monitpu.json").read())
    n, r = meta["n"], meta["r"]
    lazy = np.load(PREFIX + ".monitpu.npz")   # per-field lazy reads
    log(f"index: n={n} ({n/1e9:.2f}G) r={r}")
    assert n > 2**31, "bigserve demonstrates the beyond-int32 path"

    # ---- derive + stage the fused tables one at a time ----
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from monitpu.parallel.mesh import READS_AXIS
    from monitpu.ops.ms import SIGMA, TEXT_PAD, nib_rows
    mesh = Mesh(devs, (READS_AXIS,))
    rep_sh = NamedSharding(mesh, P())

    dev = {"__shards__": D, "__glen__": {}}

    def stage_sharded_key(name, host_arr, cuts):
        """Consume host_arr into per-shard device slices (no padded
        host duplicate; shards placed one at a time)."""
        glen = host_arr.shape[0]
        w = int(np.max(np.diff(cuts))) or 1
        pieces = []
        for s in range(D):
            lo, hi = cuts[s], cuts[s + 1]
            buf = np.zeros((1, w) + host_arr.shape[1:], host_arr.dtype)
            buf[0, : hi - lo] = host_arr[lo:hi]
            pieces.append(jax.device_put(buf, devs[s]))
        del host_arr
        gshape = (D, w) + pieces[0].shape[2:]
        dev[name + "__loc"] = jax.make_array_from_single_device_arrays(
            gshape, NamedSharding(mesh, P(READS_AXIS)), pieces)
        idt = np.int64 if glen > 2**31 - 1 else np.int32
        for part, vals in (("__lo", cuts[:-1]), ("__hi", cuts[1:])):
            dev[name + part] = jax.device_put(
                vals.astype(idt).reshape(D, 1),
                NamedSharding(mesh, P(READS_AXIS)))
        dev["__glen__"][name] = glen
        log(f"staged {name}: glen={glen}")

    def cuts_for(glen):
        return np.linspace(0, glen, D + 1).astype(np.int64)

    # scalars / small replicated
    F = np.asarray(lazy["F"], np.int64)
    dev["F32"] = jax.device_put(F, rep_sh)
    dev["n"] = np.int64(n)
    dev["r"] = np.int64(r)
    dev["sa0"] = np.int64(meta["sa0"])
    dev["sa_last"] = np.int64(meta["sa_last"])

    run_starts = np.asarray(lazy["run_starts"], np.int64)
    run_lens = np.diff(np.append(run_starts, n))
    log("run tables read")

    # pos -> run (int32 values; length n)
    run_idx = np.repeat(np.arange(r, dtype=np.int32), run_lens)
    stage_sharded_key("run_idx", run_idx, cuts_for(n))
    del run_idx
    log("run_idx staged")

    # fused lf8 rows (int64)
    rr = np.asarray(lazy["run_crank"], np.int64)
    cs = np.asarray(lazy["csamples_start"], np.int64)
    cl = np.asarray(lazy["csamples_last"], np.int64)
    Rc = cs.shape[1]
    chars = np.arange(SIGMA)[None, :]
    sam_up = cl[chars, np.clip(rr - 1, 0, Rc - 1)]
    sam_dn = cs[chars, np.clip(rr, 0, Rc - 1)]
    del cs, cl
    bcast = lambda a: np.broadcast_to(a[:, None], (r, SIGMA))
    lf8 = np.stack([
        bcast(run_starts), bcast(np.asarray(lazy["run_heads"], np.int64)),
        np.asarray(lazy["clen_at_run"], np.int64), rr,
        np.asarray(lazy["thr_cnt_run"], np.int64),
        np.asarray(lazy["thr_pos_run"], np.int64),
        sam_up, sam_dn], axis=2).reshape(r * SIGMA, 8)
    del rr, sam_up, sam_dn
    rcuts = np.linspace(0, r, D + 1).astype(np.int64) * SIGMA
    stage_sharded_key("lf8", np.ascontiguousarray(lf8), rcuts)
    del lf8
    log("lf8 staged")

    # nibble text rows
    text = np.asarray(lazy["text"])
    tp = np.concatenate([text.astype(np.uint8),
                         np.zeros(TEXT_PAD, np.uint8)])
    stage_sharded_key("text_nibr", nib_rows(tp), cuts_for(
        (tp.size + 255) // 256))
    del tp
    log("text staged (kept host copy for the CPU-engine check)")

    # Phi successor structures
    from monitpu.index.schema import BLOCK_BITS
    qs_blocks = np.arange(0, n, 1 << BLOCK_BITS, dtype=np.int64)
    for name, pre in (("phi", ""), ("phiinv", "inv")):
        z = np.asarray(lazy[f"phi{pre}_z"], np.int64)
        kb = np.searchsorted(z, qs_blocks, side="left").astype(np.int32)
        stage_sharded_key(f"{name}_kblk", kb, cuts_for(kb.shape[0]))
        # kd_u8 per position, derived chunkwise (no n-sized int64 temp)
        kd = np.empty(n, np.uint8)
        CH = 1 << 26
        for off in range(0, n, CH):
            hi = min(off + CH, n)
            q = np.arange(off, hi, dtype=np.int64)
            kq = np.searchsorted(z, q, side="left")
            kd[off:hi] = (kq - kb[q >> BLOCK_BITS].astype(np.int64)
                          ).astype(np.uint8)
        stage_sharded_key(f"{name}_kd_u8", kd, cuts_for(n))
        del kd
        p3 = np.stack([z, np.asarray(lazy[f"phi{pre}_w"], np.int64),
                       np.asarray(lazy[f"phi{pre}_wl"], np.int64)], axis=1)
        stage_sharded_key(f"{name}3", p3, cuts_for(p3.shape[0]))
        del z, p3
        log(f"{name} staged")

    # ---- sample reads + run the sharded seed stage ----
    from monitpu.parallel.shard_index import make_sharded_seed_stage
    rng = np.random.default_rng(7)
    M = 160
    reads = np.zeros((n_reads, M), np.int8)
    lens = np.full(n_reads, 150, np.int32)
    for i in range(n_reads):
        s = int(rng.integers(0, n - 200))
        reads[i, :150] = text[s:s + 150]
    lanes = np.concatenate([reads, reads])   # fwd twice: parity only
    lens2 = np.concatenate([lens, lens])
    run = make_sharded_seed_stage(mesh, dev, max_mems=12, min_len=25,
                                  work_per_read=64, max_occs=16,
                                  W=12 * n_reads, occ_cap=56 * n_reads)
    t0 = time.time()
    seeds, wire, _ = run(lanes, lens2)
    buf = np.asarray(wire)
    log(f"sharded seed stage: {2*n_reads} lanes in {time.time()-t0:.1f}s "
        f"(n_valid={int(buf[0])}, n_occ={int(buf[1])})")

    # ---- CPU-engine reference on the same reads ----
    from monitpu.ops.occs import unpack_seeds_wire
    from monitpu.align.cpu import cpu_seeds
    from monitpu.index import MoniIndex
    idx = MoniIndex.load(PREFIX)
    packed_dev, ctrs = unpack_seeds_wire(buf, 12 * n_reads, 56 * n_reads,
                                         int(seeds["len"].shape[1]))
    assert packed_dev is not None
    packed_cpu = cpu_seeds(idx, lanes, lens2, min_len=25, max_occs=16,
                           n_threads=2)

    def seedset(p):
        out = {}
        for k in range(int(np.ravel(p["n_valid"])[0])):
            key = (int(p["row"][k]), int(p["slot"][k]))
            occ = tuple(int(x) for x in
                        p["occ"][p["off"][k]:p["off"][k] + p["cnt"][k]])
            out[key] = (int(p["len"][k]), int(p["idx"][k]), occ)
        return out
    s_dev, s_cpu = seedset(packed_dev), seedset(packed_cpu)
    ok = s_dev == s_cpu
    if not ok:
        bad = [k for k in set(s_dev) | set(s_cpu)
               if s_dev.get(k) != s_cpu.get(k)]
        log(f"PARITY FAILED: {len(bad)} differing seeds, e.g. "
            f"{bad[:3]}")
    else:
        log(f"PARITY OK: {len(s_dev)} seeds identical")
    print(f"RESULT n={n} shards={D} reads={n_reads} parity={'ok' if ok else 'FAIL'}")
    assert ok


if __name__ == "__main__":
    main()
