"""Microbenchmark: random-gather shapes on the real TPU.

Answers the table-layout design questions for the seed stage:
  a) element gather cost vs index count
  b) [L, W] elementwise window gather (current extract_windows shape)
  c) vmapped dynamic_slice contiguous-window gather (one offset/lane)
  d) fused row gather from an [N, 8] table (lf8 shape)

Each op runs REPS times inside one jitted fori_loop with a data
dependency between iterations (the tunnel's ~140 ms d2h sync latency
would otherwise swamp the numbers). Results recorded in BASELINE.md;
they drive ops/ms.py's gather layout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

REPS = 30


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
    return x


def bench(make_body, idx):
    """make_body(idx)->fn(i32 carry)->i32 carry; times REPS dependent
    iterations inside one jit, returns ms per iteration."""
    @jax.jit
    def run(idx):
        body = make_body(idx)
        return jax.lax.fori_loop(
            0, REPS, lambda t, c: body(c), jnp.int32(0))
    sync(run(idx))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(run(idx))
        best = min(best, time.time() - t0)
    # one extra timed run of a single iteration to estimate sync+launch
    return best * 1e3 / REPS


def main():
    N = 16_800_000
    table = jnp.arange(N, dtype=jnp.uint32)
    rows8 = jnp.arange(3_200_000 * 8, dtype=jnp.int32).reshape(-1, 8)
    rng = np.random.default_rng(0)

    for L in (65_536, 393_216):
        idx = jnp.asarray(rng.integers(0, N - 64, size=L, dtype=np.int32))

        def elem1(idx):
            def body(c):
                return table[(idx + c) % (N - 64)].astype(jnp.int32).max()
            return body
        t = bench(elem1, idx)
        print(f"L={L}: 1-elem gather          {t:7.1f}ms "
              f"({t*1e6/L:6.1f}ns/lane)", flush=True)

        for W in (2, 5, 20):
            def elemw(idx, W=W):
                def body(c):
                    iw = ((idx + c) % (N - 64))[:, None] + \
                        jnp.arange(W)[None, :]
                    return table[iw].astype(jnp.int32).max()
                return body
            t = bench(elemw, idx)
            print(f"L={L}: [L,{W:>2d}] elementwise    {t:7.1f}ms "
                  f"({t*1e6/L:6.1f}ns/lane)", flush=True)

            def dynw(idx, W=W):
                def body(c):
                    i = (idx + c) % (N - 64)
                    out = jax.vmap(lambda s: jax.lax.dynamic_slice(
                        table, (s,), (W,)))(i)
                    return out.astype(jnp.int32).max()
                return body
            t = bench(dynw, idx)
            print(f"L={L}: dynslice window W={W:<3d} {t:7.1f}ms "
                  f"({t*1e6/L:6.1f}ns/lane)", flush=True)

        ridx = jnp.asarray(rng.integers(0, rows8.shape[0] - 64, size=L,
                                        dtype=np.int32))

        def rowg(ridx):
            def body(c):
                return rows8[(ridx + c) % (rows8.shape[0] - 64)].max()
            return body
        t = bench(rowg, ridx)
        print(f"L={L}: [N,8] row gather       {t:7.1f}ms "
              f"({t*1e6/L:6.1f}ns/lane)", flush=True)


if __name__ == "__main__":
    main()
