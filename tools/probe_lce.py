"""One-off probe: needy-LCE statistics + seed-stage timing vs pool size
on the real TPU over the bench corpus. (Round-5 instrumentation for the
VERDICT r4 'device_seed 252 vs 152 ms' discrepancy.)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from monitpu.ops.ms import (ms_pointers_batch, prepare_tables,
                                find_mems_batch)
    from monitpu.index.alphabet import encode_batch

    idx, lift = bench.build_bench_index()
    tables = prepare_tables(idx, cache=bench.bench_prefix() + ".tables.npz")
    rng = np.random.default_rng(99)
    B = 4096
    reads, _ = bench.sample_reads(idx, lift, B, rng)
    fwd, rc, lens = encode_batch([r[1] for r in reads], 160)
    lanes = jnp.concatenate([jnp.asarray(fwd), jnp.asarray(rc)])
    lens2 = jnp.concatenate([jnp.asarray(lens)] * 2)

    ptr = np.asarray(ms_pointers_batch(tables, lanes, lens2))
    prev = np.pad(ptr, ((0, 0), (1, 0)), constant_values=-2)[:, :160]
    mask = np.arange(160)[None, :] < np.asarray(lens2)[:, None]
    needy = (ptr != prev + 1) & mask
    per_row = needy.sum(axis=1)
    print(f"needy/row: mean={per_row.mean():.1f} p50={np.percentile(per_row,50):.0f} "
          f"p95={np.percentile(per_row,95):.0f} max={per_row.max()} "
          f"total={per_row.sum()} rows={per_row.size} "
          f"-> batch-global need/row={per_row.sum()/per_row.size:.1f}")

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])
        return x
    sync(jnp.zeros(4, jnp.int32) + 1)
    for work in [48, 64, 72, 96]:
        fn = lambda: find_mems_batch(tables, lanes, lens2, max_mems=12,
                                     min_len=25, work_per_read=work)
        sync(fn())
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            sync(fn())
            best = min(best, time.time() - t0)
        print(f"work={work}: find_mems={best*1e3:.1f}ms")


if __name__ == "__main__":
    main()
