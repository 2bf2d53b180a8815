"""Host post-seed phase breakdown over the native prof counters.

Usage: python tools/profile_postseed.py [B ...] [--pe]   (default 4096)

Feeds the cached bench index + sampled reads through the real SE
pipeline (TPU seed stage -> native plan/resolve postseed -> native SAM
formatter) with the native phase counters (runtime.cpp NativeProf)
enabled, and reports where the host milliseconds go per batch:

  build_ns    seed unpack -> Mem structs + filters (runtime.cpp build)
  chain_ns    find_chains[_secondary] DP
  select_ns   check_k selection + extz PLAN pass (score jobs)
  resolve_ns  device-score resolve + winner finalize (traceback/MD/NM)

plus Python-side wall times for wire pull/unpack, job dispatch/collect
and SAM formatting. This is the missing consumer of monitpu_prof_*
(VERDICT r3 weak #2); results are recorded in BASELINE.md.
"""
import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pe = "--pe" in sys.argv
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4096]
    from monitpu.native.sais import _load
    from monitpu.align.aligner import Aligner, AlignConfig
    import bench

    lib = _load()
    lib.monitpu_prof_reset.argtypes = [ctypes.c_int]
    lib.monitpu_prof_read.argtypes = [ctypes.POINTER(ctypes.c_int64)]

    idx, lift = bench.build_bench_index()
    aligner = Aligner(idx, AlignConfig(), liftidx=lift,
                      tables_cache=bench.bench_prefix() + ".tables.npz")
    rng = np.random.default_rng(99)
    if pe:
        from monitpu.align.paired import PairedAligner
        pal = PairedAligner(aligner)
        b1, b2, _ = bench.sample_pairs(idx, lift, max(sizes), rng)
        pal.learn_pair_batch(b1[:sizes[0]], b2[:sizes[0]])
    else:
        reads, _ = bench.sample_reads(idx, lift, max(sizes), rng)

    for B in sizes:
        if pe:
            c1, c2 = b1[:B], b2[:B]
            pal.complete_pair_batch_sam(pal.submit_pair_batch(c1, c2))
        else:
            chunk = reads[:B]
            # warm (compile + sticky pools)
            aligner.complete_batch_sam(aligner.submit_batch(chunk))

        lib.monitpu_prof_reset(1)
        t = {}

        def clock(name, fn):
            t0 = time.time()
            out = fn()
            t[name] = t.get(name, 0.0) + time.time() - t0
            return out

        reps = 3
        for _ in range(reps):
            if pe:
                h = clock("submit(enc+h2d+kernels)",
                          lambda: pal.submit_pair_batch(c1, c2))
                st = clock("begin(pull+plan+dispatch)",
                           lambda: pal.begin_complete_pair_sam(h))
                clock("finish(collect+resolve+sam)",
                      lambda: pal.finish_complete_pair_sam(st))
            else:
                h = clock("submit(enc+h2d+kernels)",
                          lambda: aligner.submit_batch(chunk))
                st = clock("begin(pull+plan+dispatch)",
                           lambda: aligner.begin_complete_sam(h))
                clock("finish(collect+resolve+sam)",
                      lambda: aligner.finish_complete_sam(st))
        c = (ctypes.c_int64 * 8)()
        lib.monitpu_prof_read(c)
        lib.monitpu_prof_reset(0)
        ms = lambda ns: ns / 1e6 / reps
        print(f"B={B} ({reps} reps, per batch):")
        for k, v in t.items():
            print(f"  wall {k:<28s} {v/reps*1e3:8.1f} ms")
        print(f"  native build (seeds->mems)     {ms(c[0]):8.1f} ms"
              f"   ({c[4]//reps} mems)")
        print(f"  native chain DP                {ms(c[1]):8.1f} ms"
              f"   ({c[5]//reps} anchors -> {c[6]//reps} chains)")
        print(f"  native select/plan             {ms(c[2]):8.1f} ms"
              f"   ({c[7]//reps} extz jobs)")
        print(f"  native resolve/finalize        {ms(c[3]):8.1f} ms")
        tot_native = sum(ms(c[i]) for i in range(4))
        print(f"  native total                   {tot_native:8.1f} ms"
              f"  (thread-summed; {aligner.cfg.postseed_threads} threads)")


if __name__ == "__main__":
    main()
