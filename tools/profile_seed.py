"""Per-sub-stage device timing for the seed stage on the real TPU.

Usage: python tools/profile_seed.py [B ...]
Loads the cached bench index/tables, then times ms_pointers_batch,
ms_lengths_batch, populate_seeds_batch and pack_seeds_wire separately
(block_until_ready between stages) at each batch size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    from monitpu.index import MoniIndex
    from monitpu.index.liftover import LiftIndex
    from monitpu.ops.ms import (ms_pointers_batch, ms_lengths_batch,
                                prepare_tables, find_mems_batch)
    from monitpu.ops.occs import populate_seeds_batch, pack_seeds_wire
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    idx, lift = bench.build_bench_index()
    tables = prepare_tables(idx, cache=bench.bench_prefix() + ".tables.npz")
    rng = np.random.default_rng(99)
    reads, _ = bench.sample_reads(idx, lift, max(sizes), rng)
    from monitpu.index.alphabet import encode_batch
    M = 160
    fwd, rc, lens = encode_batch([r[1] for r in reads], M)

    for B in sizes:
        lanes = jnp.concatenate([jnp.asarray(fwd[:B]), jnp.asarray(rc[:B])])
        lens2 = jnp.concatenate([jnp.asarray(lens[:B])] * 2)
        jax.block_until_ready(lanes)

        def sync(out):
            # under the axon tunnel block_until_ready returns early; a
            # real 1-element D2H pull (~25 ms fixed latency) is the only
            # reliable fence
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
            return out

        sync(jnp.zeros(4, jnp.int32) + 1)   # pay the one-time d2h init
        t_sync0 = time.time()
        for _ in range(3):
            sync(jnp.zeros(4, jnp.int32) + 1)
        sync_ms = (time.time() - t_sync0) * 1e3 / 3

        def t(fn, reps=3):
            out = sync(fn())
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                out = sync(fn())
                best = min(best, time.time() - t0)
            return best * 1e3 - sync_ms, out

        ms_ptr, ptr = t(lambda: ms_pointers_batch(tables, lanes, lens2))
        ms_len, lens_out = t(lambda: ms_lengths_batch(
            tables, lanes, lens2, ptr, work_per_read=8))
        ms_fm, mems = t(lambda: find_mems_batch(
            tables, lanes, lens2, max_mems=12, min_len=25,
            work_per_read=8))
        mp, ml, mi, mc, _ctr = mems
        ms_ps, seeds = t(lambda: populate_seeds_batch(
            tables, mp, ml, mi, mc, max_occs=32, min_len=25))

        def packit():
            s = dict(seeds)
            oc = s.pop("occ_capped")
            wd = s.pop("work_dropped")
            ctrs = jnp.stack([oc, oc, oc, wd])
            return pack_seeds_wire(s, W=8 * B, occ_cap=48 * B, ctrs=ctrs)
        ms_pk, wire = t(packit)
        tx0 = time.time()
        buf = np.asarray(wire)
        ms_tx = (time.time() - tx0) * 1e3
        total = ms_fm + ms_ps + ms_pk
        print(f"B={B:6d}: pointers={ms_ptr:7.1f}ms lengths={ms_len:7.1f}ms "
              f"find_mems={ms_fm:7.1f}ms seeds={ms_ps:7.1f}ms "
              f"pack={ms_pk:6.1f}ms d2h={ms_tx:6.1f}ms "
              f"total={total:7.1f}ms -> {B/ (total/1e3):7.0f} reads/s "
              f"(device only)", flush=True)


if __name__ == "__main__":
    main()
