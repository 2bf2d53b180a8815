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
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
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


def sample_pairs(idx, n_pairs, rng, insert_lo=250, insert_hi=400):
    from monitpu.index.alphabet import decode_seq, revcomp_codes
    text = idx.text
    starts = np.asarray(idx.seq_starts)
    b1, b2 = [], []
    L = READ_LEN
    for i in range(n_pairs):
        hap = int(rng.integers(0, len(starts) - 1))
        ins = int(rng.integers(insert_lo, insert_hi))
        lo, hi = int(starts[hap]), int(starts[hap + 1]) - 1 - ins
        s = int(rng.integers(lo, hi))
        frag = text[s:s + ins]
        m1 = frag[:L].copy()
        m2 = revcomp_codes(frag[-L:].copy())
        for codes in (m1, m2):
            p = rng.integers(0, L, size=max(1, int(0.005 * L)))
            codes[p] = rng.integers(1, 5, size=p.size)
        b1.append((f"p{i}/1", decode_seq(m1), "I" * L))
        b2.append((f"p{i}/2", decode_seq(m2), "I" * L))
    return b1, b2


def bench_pe(idx, rng, n_pairs, batch):
    """Paired-end throughput (the reference's headline mode)."""
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.align.paired import PairedAligner
    pal = PairedAligner(Aligner(idx, AlignConfig()))
    b1, b2 = sample_pairs(idx, n_pairs, rng)
    t0 = time.time()
    pal.learn_pair_batch(b1[:batch], b2[:batch])
    log(f"PE learn+compile: {time.time()-t0:.1f}s "
        f"(ins n={pal.ins.count} mean={pal.ins.mean:.0f} "
        f"std={pal.ins.std_dev:.1f})")
    pal.align_pair_batch(b1[:batch], b2[:batch])  # warm align path
    t0 = time.time()
    done = aligned = 0
    pending = None
    for off in range(batch, n_pairs, batch):
        c1, c2 = b1[off:off + batch], b2[off:off + batch]
        if len(c1) < batch:
            break
        h = pal.submit_pair_batch(c1, c2)
        if pending is not None:
            recs = pal.complete_pair_batch(pending)
            done += len(recs) // 2
            aligned += sum(not (r.flag & 4) for r in recs) // 2
        pending = h
    if pending is not None:
        recs = pal.complete_pair_batch(pending)
        done += len(recs) // 2
        aligned += sum(not (r.flag & 4) for r in recs) // 2
    dt = time.time() - t0
    log(f"PE: {done} pairs in {dt:.2f}s -> {done/dt:.0f} pairs/s "
        f"({aligned}/{done} aligned)")
    return done / dt


def main():
    import contextlib
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    # observability: MONITPU_TRACE=<dir> captures a jax profiler trace
    # of the measured loop (the MTIME/malloc_count analog, SURVEY.md §5)
    trace_dir = os.environ.get("MONITPU_TRACE")
    trace_cm = (jax.profiler.trace(trace_dir) if trace_dir
                else contextlib.nullcontext())

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
    with trace_cm:
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
    if trace_dir:
        log(f"profiler trace written to {trace_dir}")
    for k in ("lce_overflow", "mem_overflow", "occ_walk_capped",
              "seed_pack_overflow"):
        if aligner.stats.get(k):
            log(f"counter {k}: {aligner.stats[k]}")
    # device memory observability (malloc_count_peak analog)
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            log(f"device memory: in_use={ms.get('bytes_in_use', 0)/1e6:.0f}MB "
                f"peak={ms.get('peak_bytes_in_use', 0)/1e6:.0f}MB")
    except Exception:
        pass
    rps = n_done / dt
    log(f"{n_done} reads in {dt:.2f}s -> {rps:.0f} reads/s "
        f"({aligned}/{n_done} aligned)")

    pe_pps = None
    if os.environ.get("BENCH_PE"):
        pe_pps = bench_pe(idx, np.random.default_rng(7),
                          int(os.environ.get("BENCH_PAIRS", 8192)), BATCH)

    print(json.dumps({
        "metric": "align_reads_per_sec_1chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / cpu_rps, 3),
        "cpu_baseline_rps": round(cpu_rps, 1),
        "cpu_cores": ncpu,
        **({"pe_pairs_per_sec": round(pe_pps, 1)} if pe_pps else {}),
    }))


if __name__ == "__main__":
    main()
