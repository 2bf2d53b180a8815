"""Multi-chip execution: device mesh + shardings.

The reference's only parallelism is N pthreads pulling read batches from
a mutex-guarded FASTQ cursor (include/aligner/align_reads_dispatcher.hpp
:118-198). The TPU-native equivalent is pure data parallelism over the
read batch axis: the index tables are replicated to every device (they
are read-only, exactly like the reference's shared immutable index), and
every batched kernel shards along axis 0 of the read arrays. XLA inserts
no collectives in the hot path — reads are embarrassingly parallel, as
in the reference. Insert-size learning (paired-end) is the one global
reduction and uses a psum of Welford accumulators (mirrors the
mutex-merged accumulators, aligner_ksw2.hpp:816-885).

Index sharding for HBM overflow has a working prototype
(parallel/shard_index.py: position-range slices of the pos->run map
and lf8 rows, masked owner-local gathers + one [B] and one [B, 8]
psum per backward step; bit-parity pinned on a virtual CPU mesh by
tests/test_shard_index.py). The honest device-memory arithmetic for
the aligner-path tables (ops/ms.prepare_tables_host layout):

    per position: run_idx 4 B + text 0.5 B (one nibble-row encoding
                  since round 5) + phi/phiinv kd_u8 2 B
                  + phi block anchors ~0.13 B          ~= 6.6 B/pos
    per run:      lf8 (SIGMA x 8 x int32) 192 B
                  + phi3/phiinv3 rows ~24 B            ~= 216 B/run

    HBM(n, r) ~= 7.4 n + 216 r     (measured 0.72 GB at the bench's
                 n = 16.0 M, r = 3.12 M: 0.12 + 0.60 GB; bench.py logs
                 peak_bytes_in_use for each run)

On a 16 GB v5e chip the binding constraint depends on repetitiveness:
at n/r = 5 (the synthetic bench) HBM runs out near n ~= 0.3 G, well
BEFORE the int32 n < 2^31 schema bound; at pangenome repetitiveness
(n/r ~= 20-100, many haplotypes of one reference) the crossover is
n ~= 1.2-1.9 G and the int32 bound binds first. Indexes beyond either
limit are served today by the 64-bit CPU engine (index/build.py's
int64 path + --engine cpu); the TPU plan of record for them is the
shard_index.py design scaled out (its int32 local offsets hold to
D * 2^31 positions). For HBM-tight cases within int32, AlignConfig
(table_layout="compact") swaps the LF step onto the 1.07 B/position
block+delta map + 8 B run2 + 16 B rc4 + 8 B csam2 rows (~128 B/run,
five gathers per step instead of two; bit-parity pinned by
tests/test_ms_kernel.py::test_compact_layout_parity), moving the
crossover at pangenome repetitiveness from n ~= 1.2-1.9 G to the
int32 schema bound itself.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

READS_AXIS = "reads"


def make_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()
        if n_devices and len(devices) < n_devices:
            # single-chip dev box: validate shardings on virtual CPU devices
            devices = jax.devices("cpu")
        devices = devices[:n_devices] if n_devices else devices
    if n_devices and len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(devices, (READS_AXIS,))


def replicate_tables(mesh, tables):
    sh = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sh) if hasattr(v, "shape") else v
            for k, v in tables.items()}


def shard_batch(mesh, *arrays):
    sh = NamedSharding(mesh, P(READS_AXIS))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def table_bytes(n, r, layout="fused"):
    """Device-table HBM estimate (component breakdown in the module
    docstring): fused 2-gather LF rows vs compact 5-gather rows."""
    if layout == "compact":
        return int(3.7 * n + 152 * r)
    return int(6.6 * n + 216 * r)


def device_hbm_bytes(default=16e9):
    try:
        ms = jax.devices()[0].memory_stats() or {}
        return float(ms.get("bytes_limit", default))
    except Exception:
        return float(default)


def choose_table_layout(index, hbm_bytes=None, budget_frac=0.6):
    """'fused' | 'compact' | 'sharded' from HBM arithmetic — the
    AlignConfig(table_layout='auto') resolver. budget_frac leaves HBM
    headroom for read batches, worklists, and XLA temporaries. Indexes
    beyond int32 positions always shard (their 64-bit global indices
    only fit the device path through shard-local int32 addressing,
    parallel/shard_index.py)."""
    import numpy as np
    if index.n > 2**31 - 2 or np.asarray(index.run_starts).dtype == np.int64:
        return "sharded"
    budget = budget_frac * (hbm_bytes if hbm_bytes is not None
                            else device_hbm_bytes())
    if table_bytes(index.n, index.r, "fused") <= budget:
        return "fused"
    if table_bytes(index.n, index.r, "compact") <= budget:
        return "compact"
    return "sharded"
