"""Engine-vs-engine fuzz sweep at bench scale (VERDICT r4 next #8).

Streams >= 100k SE reads and >= 25k PE pairs from the bench corpus
through BOTH engines — the TPU-path seed stage (JAX kernels; runs on
the CPU backend when no chip is present, same code) and the native CPU
seed engine — and byte-compares every SAM line. The engines share the
native post-seed runtime, so any divergence isolates a seed-stage
correctness bug (this sweep is what caught the silent half-seed
worklist drop in round 5). Writes the artifact FUZZ_r<N>.json.

The deeper per-field independent check against the Python oracle runs
in tools/paritycheck.py (SE + PE, --indel); this sweep trades oracle
depth for 100x the volume.

Usage: [JAX_PLATFORMS=cpu] python tools/fuzzsweep.py [n_reads] [n_pairs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 102_400
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 25_600
    B = 4096
    import bench
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.align.paired import PairedAligner

    idx, lift = bench.build_bench_index()
    tp = Aligner(idx, AlignConfig(postseed_threads=2), liftidx=lift,
                 tables_cache=bench.bench_prefix() + ".tables.npz")
    cp = Aligner(idx, AlignConfig(engine="cpu", postseed_threads=2),
                 liftidx=lift)
    rng = np.random.default_rng(20260821)

    t0 = time.time()
    se_mismatch = se_done = 0
    for off in range(0, n_reads, B):
        reads, _ = bench.sample_reads(idx, lift, B, rng)
        s1, _ = tp.complete_batch_sam(tp.submit_batch(reads))
        s2, _ = cp.complete_batch_sam(cp.submit_batch(reads))
        se_done += len(reads)
        if s1 != s2:
            l1, l2 = s1.splitlines(), s2.splitlines()
            se_mismatch += sum(1 for a, b in zip(l1, l2) if a != b) + \
                abs(len(l1) - len(l2))
        print(f"SE {se_done}/{n_reads}: cumulative mismatched lines = "
              f"{se_mismatch} ({time.time()-t0:.0f}s)", flush=True)

    pe_mismatch = pe_done = 0
    ptp, pcp = PairedAligner(tp), PairedAligner(cp)
    b1, b2, _ = bench.sample_pairs(idx, lift, B, rng)
    ptp.learn_pair_batch(b1, b2)
    pcp.ins = ptp.ins
    for off in range(0, n_pairs, B):
        b1, b2, _ = bench.sample_pairs(idx, lift, B, rng)
        s1, _ = ptp.complete_pair_batch_sam(ptp.submit_pair_batch(b1, b2))
        s2, _ = pcp.complete_pair_batch_sam(pcp.submit_pair_batch(b1, b2))
        pe_done += len(b1)
        if s1 != s2:
            l1, l2 = s1.splitlines(), s2.splitlines()
            pe_mismatch += sum(1 for a, b in zip(l1, l2) if a != b) + \
                abs(len(l1) - len(l2))
        print(f"PE {pe_done}/{n_pairs}: cumulative mismatched lines = "
              f"{pe_mismatch} ({time.time()-t0:.0f}s)", flush=True)

    out = {
        "se_reads": se_done, "se_mismatched_lines": se_mismatch,
        "pe_pairs": pe_done, "pe_mismatched_lines": pe_mismatch,
        "tpu_stats": {k: int(v) for k, v in tp.stats.items()},
        "wall_s": round(time.time() - t0, 1),
        "backend": os.environ.get("JAX_PLATFORMS", "device"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FUZZ_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"artifact -> {path}")
    assert se_mismatch == 0 and pe_mismatch == 0, "ENGINE DIVERGENCE"


if __name__ == "__main__":
    main()
