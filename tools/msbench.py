"""Microbench of the MS kernel stages on the cached bench index."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from monitpu.index import MoniIndex
from monitpu.ops.ms import (prepare_tables, ms_pointers_batch,
                            ms_lengths_batch, find_mems_batch)
from monitpu.ops.occs import populate_seeds_batch

idx = MoniIndex.load("data/bench")
tables = prepare_tables(idx)
rng = np.random.default_rng(7)
B, M = 2048, 160
text = idx.text
starts = np.asarray(idx.seq_starts)
reads = np.zeros((B, M), np.int32)
lens = np.full(B, 150, np.int32)
for b in range(B):
    s = int(rng.integers(0, idx.n - 200))
    codes = text[s:s + 150].astype(np.int32)
    codes[codes == 0] = 1
    p = rng.integers(0, 150, size=2)
    codes[p] = rng.integers(1, 5, size=2)
    reads[b, :150] = codes
reads = jnp.asarray(reads); lens = jnp.asarray(lens)

def _sync(out):
    # block_until_ready can return early via the axon tunnel; transfer
    # one element per leaf as a reliable fence
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def t(name, fn, reps=5):
    out = fn(); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms")
    return out

ptr = t("ms_pointers", lambda: ms_pointers_batch(tables, reads, lens))
t("ms_lengths", lambda: ms_lengths_batch(tables, reads, lens, ptr))
mems = t("find_mems(all)", lambda: find_mems_batch(tables, reads, lens,
                                                   max_mems=12, min_len=25))
mp, ml, mi, mc, _ctr = mems
t("seeds", lambda: populate_seeds_batch(tables, mp, ml, mi, mc,
                                        max_occs=32, min_len=25))
