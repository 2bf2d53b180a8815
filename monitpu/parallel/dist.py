"""Multi-host data-parallel alignment runtime.

The reference is single-node (pthreads over a mutex-guarded FASTQ
cursor, per-thread SAM shards concatenated after the header,
align_reads_dispatcher.hpp:72-96, 258-289; the legacy tools split the
FASTQ by byte ranges per thread, src/mems.cpp:137-158). The multi-host
equivalent built here:

  * `jax.distributed.initialize` per host (CLI --dist-* flags);
  * deterministic contiguous read-range assignment per host (the
    byte-range split generalized to records, so the shard concatenation
    reproduces the single-host output byte-for-byte);
  * per-host SAM shard files + a deterministic merge on host 0
    (mirrors the per-thread shard merge);
  * the paired-end insert-size model is reduced across hosts by
    summing each host's Welford (count, mean, m2) triple — the
    distributed analog of the reference's mutex-guarded accumulator
    merge (aligner_ksw2.hpp:848-882) — via an all-gather over the
    distributed CPU/TPU backend.
"""

from __future__ import annotations

import os
import pathlib


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int):
    """jax.distributed bring-up (idempotent)."""
    import jax
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_read_range(total_reads: int, num_hosts: int, host_id: int):
    """Contiguous per-host record range [lo, hi) — the deterministic
    generalization of the reference's FASTQ byte-range split."""
    per = -(-total_reads // num_hosts)
    lo = min(host_id * per, total_reads)
    return lo, min(lo + per, total_reads)


def count_fastq_records(path: str) -> int:
    """One cheap pass; supports gzip. 4 lines per record."""
    import gzip
    op = gzip.open if str(path).endswith(".gz") else open
    n = 0
    with op(path, "rt") as f:
        for _ in f:
            n += 1
    return n // 4


def shard_path(output: str, host_id: int) -> str:
    return f"{output}.shard{host_id}"


def merge_shards(output: str, num_hosts: int, header: str):
    """Host 0: header + shards in host order -> the final SAM. With
    contiguous read ranges this equals the single-host output
    byte-for-byte."""
    with open(output, "w") as out:
        out.write(header)
        for h in range(num_hosts):
            p = pathlib.Path(shard_path(output, h))
            with open(p) as f:
                for chunk in iter(lambda: f.read(1 << 20), ""):
                    out.write(chunk)
            p.unlink()


def allreduce_welford(ins, num_processes: int):
    """Merge per-host InsertModel states: all-gather each host's
    (count, mean, m2) triple and fold them in process order (the
    deterministic analog of the reference's mutex merge). Mutates and
    returns `ins`."""
    if num_processes <= 1:
        return ins
    import numpy as np
    from jax.experimental import multihost_utils
    triple = np.array([float(ins.count), ins.mean, ins.m2], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(triple))
    ins.count, ins.mean, ins.m2 = 0, 0.0, 0.0
    ins.complete = False
    for c, m, m2 in gathered:
        c = int(c)
        if c == 0:
            continue
        if ins.count > 0:
            t = ins.count + c
            delta = ins.mean - m
            ins.m2 += m2 + (delta * delta * ins.count * c) / t
            ins.mean = (ins.count * ins.mean + c * m) / t
            ins.count = t
        else:
            ins.count, ins.mean, ins.m2 = c, m, m2
    ins.complete = ins.count >= ins.learning_n
    return ins
