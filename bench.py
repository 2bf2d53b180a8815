"""Benchmark: end-to-end single-chip alignment throughput (reads/s).

Runs the full align pipeline (MEM find -> seeds -> chain -> piecewise
extend -> SAM) on a synthetic multi-haplotype pangenome on the real TPU
chip, and prints ONE JSON line.

vs_baseline denominator: MEASURED on this machine, same data, same
output semantics — the repo's own native CPU engine (monitpu align
--engine cpu: C++ seed stage native/cpuseeds.cpp + the shared post-seed
runtime, using all host cores). The reference C++ tree is not buildable
here (thirdparty submodules are empty; BASELINE.md), and this in-repo
engine is a strictly STRONGER baseline than reference CPU MONI: flat
O(1)-gather tables instead of sdsl succinct rank/select. Both engines
produce byte-identical SAM (tests/test_cpu_engine.py), so reads/s is an
apples-to-apples compare.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GENOME_MB = float(os.environ.get("BENCH_GENOME_MB", 4.0))
N_HAPS = int(os.environ.get("BENCH_HAPS", 4))
N_READS = int(os.environ.get("BENCH_READS", 16384))
BATCH = int(os.environ.get("BENCH_BATCH", 2048))
READ_LEN = 150


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_bench_index(cache="data/bench"):
    from monitpu.index import build_index, MoniIndex
    if os.path.exists(cache + ".monitpu.npz"):
        log("loading cached bench index")
        return MoniIndex.load(cache)
    rng = np.random.default_rng(1234)
    n = int(GENOME_MB * 1e6)
    base = rng.integers(1, 5, size=n, dtype=np.int8)
    seqs = []
    for h in range(N_HAPS):
        s = base.copy()
        # ~0.1% SNPs per haplotype
        p = rng.integers(0, n, size=n // 1000)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    t0 = time.time()
    idx = build_index(seqs, names=[f"hap{h}" for h in range(N_HAPS)],
                      already_encoded=True)
    log(f"index built: n={idx.n} r={idx.r} n/r={idx.n/idx.r:.1f} "
        f"({time.time()-t0:.1f}s, {idx.nbytes()/1e6:.0f} MB tables)")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    idx.save(cache)
    return idx


def sample_reads(idx, n_reads, rng):
    from monitpu.index.alphabet import decode_seq, revcomp_codes
    text = idx.text
    starts = np.asarray(idx.seq_starts)
    reads = []
    for i in range(n_reads):
        hap = int(rng.integers(0, len(starts) - 1))
        lo, hi = int(starts[hap]), int(starts[hap + 1]) - 1 - READ_LEN
        s = int(rng.integers(lo, hi))
        codes = text[s:s + READ_LEN].copy()
        # ~0.5% sequencing error
        p = rng.integers(0, READ_LEN, size=max(1, int(0.005 * READ_LEN)))
        codes[p] = rng.integers(1, 5, size=p.size)
        if rng.random() < 0.5:
            codes = revcomp_codes(codes)
        reads.append((f"r{i}", decode_seq(codes), "I" * READ_LEN))
    return reads


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from monitpu.align.aligner import Aligner, AlignConfig

    idx = build_bench_index()
    t0 = time.time()
    aligner = Aligner(idx, AlignConfig())
    log(f"tables on device: {time.time()-t0:.1f}s")
    rng = np.random.default_rng(99)
    t0 = time.time()
    reads = sample_reads(idx, N_READS, rng)
    log(f"sampled {N_READS} reads: {time.time()-t0:.1f}s")

    # warmup / compile
    t0 = time.time()
    aligner.align_batch(reads[:BATCH])
    log(f"warmup+compile: {time.time()-t0:.1f}s")

    # ---- measured CPU baseline: same data through the CPU engine ----
    from monitpu.align.cpu import CpuAligner
    import multiprocessing
    ncpu = multiprocessing.cpu_count()
    cpu = CpuAligner(idx, AlignConfig(postseed_threads=ncpu))
    cpu.align_batch(reads[:256])          # warm the code paths
    t0 = time.time()
    crecs = cpu.align_batch(reads[:4096])
    cpu_dt = time.time() - t0
    cpu_rps = len(crecs) / cpu_dt
    log(f"CPU baseline ({ncpu} cores): {len(crecs)} reads in "
        f"{cpu_dt:.2f}s -> {cpu_rps:.0f} reads/s")

    t0 = time.time()
    n_done = 0
    aligned = 0
    pending = None      # double-buffer: device computes k+1 during host k
    for off in range(BATCH, N_READS, BATCH):
        chunk = reads[off:off + BATCH]
        if len(chunk) < BATCH:
            break
        handle = aligner.submit_batch(chunk)
        if pending is not None:
            recs = aligner.complete_batch(pending)
            n_done += len(recs)
            aligned += sum(not (r.flag & 4) for r in recs)
        pending = handle
    if pending is not None:
        recs = aligner.complete_batch(pending)
        n_done += len(recs)
        aligned += sum(not (r.flag & 4) for r in recs)
    dt = time.time() - t0
    rps = n_done / dt
    log(f"{n_done} reads in {dt:.2f}s -> {rps:.0f} reads/s "
        f"({aligned}/{n_done} aligned)")

    print(json.dumps({
        "metric": "align_reads_per_sec_1chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / cpu_rps, 3),
        "cpu_baseline_rps": round(cpu_rps, 1),
        "cpu_cores": ncpu,
    }))


if __name__ == "__main__":
    main()
