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

Index sharding for HBM overflow is deliberately NOT implemented: the
schema's own n < 2^31 positions bound (int32 tables, index/build.py)
binds BEFORE HBM does on a 16 GB v5e chip — position-indexed device
arrays cost ~8 bytes/position (pos->run map, Phi anchor deltas, packed
text), so the largest legal index (~2.1 G positions) tops out around
the chip's HBM. Growing past that requires widening the schema to
int64 first, at which point position-range sharding with routed
gathers (all_gather queries / psum answers inside shard_map) is the
plan of record. For very large n within the bound, the pos->run map
can be swapped back to the 1.25 B/position block+delta layout that the
SPUMONI path still uses (ops/ms.lf_core_tables).
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
