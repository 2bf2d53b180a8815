"""The `monitpu` command-line driver.

Mirrors the reference pipeline driver's subcommands (pipeline/moni.in:
658-800): build | align | ms | mems, with the same flag names where they
exist (-i index, -1/-2 mates, -p pattern/single reads, -o output,
-l min MEM length, -b batch size, -S/-F seed filters, chaining -w/-v...).
Index construction is direct (no PFP subprocess chain): FASTA (or
FASTA+VCF for pangenomes) -> suffix array -> MoniIndex arrays.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def log(*a):
    print("[monitpu]", *a, file=sys.stderr, flush=True)


def cmd_build(args):
    import datetime
    import numpy as np
    from .index import build_index
    from .io import read_fasta

    # operational build log tee (<prefix>.monitpu.log), mirroring the
    # reference driver's <prefix>.moni.log (pipeline/moni.in:94-111):
    # every build message lands on stderr AND in the log file, with the
    # invocation and wall time recorded.
    d = os.path.dirname(args.output)
    if d:
        os.makedirs(d, exist_ok=True)
    logf = open(args.output + ".monitpu.log", "a")

    def blog(*a):
        msg = " ".join(str(x) for x in a)
        log(msg)
        logf.write(f"[{datetime.datetime.now().isoformat(' ', 'seconds')}] "
                   f"{msg}\n")
        logf.flush()

    blog(f"monitpu build: {' '.join(sys.argv[1:])}")
    t0 = time.time()
    try:
        if args.vcf:
            from .index.pangenome import build_pangenome_index
            idx, lift = build_pangenome_index(args.reference, args.vcf,
                                              samples=args.samples,
                                              haplotypes=args.haplotype,
                                              log=blog)
            lift.save(args.output)
        else:
            seqs = read_fasta(args.reference)
            blog(f"read {len(seqs)} sequences")
            idx = build_index([s for _, s in seqs],
                              names=[n for n, _ in seqs])
        blog(f"index: n={idx.n} r={idx.r} n/r={idx.n/idx.r:.2f} "
             f"tables={idx.nbytes()/1e6:.1f}MB ({time.time()-t0:.1f}s)")
        idx.save(args.output)
        blog(f"saved {args.output}.monitpu.npz")
        if getattr(args, "spumoni", False):
            from .ops.spumoni import save_spumoni
            save_spumoni(idx, args.output)
            blog(f"saved {args.output}.spumoni.npz (threshold-only)")
        blog(f"build complete in {time.time()-t0:.1f}s")
    except BaseException as e:
        blog(f"build FAILED after {time.time()-t0:.1f}s: {e!r}")
        raise
    finally:
        logf.close()


def _parse_gap_pair(s):
    """'-O 4,13' / '-E 2,1' comma syntax (align_full_ksw2.cpp:207-214):
    a single value sets both; a pair sets (primary, long-gap)."""
    parts = str(s).split(",")
    g1 = int(parts[0])
    g2 = int(parts[1]) if len(parts) > 1 else g1
    return g1, g2


def _load_aligner(args):
    from .index import MoniIndex
    from .align.aligner import Aligner, AlignConfig
    from .ops.chain import ChainConfig
    from .ops.sw import SWParams

    gapo, gapo2 = _parse_gap_pair(getattr(args, "gapo", "4,13"))
    gape, gape2 = _parse_gap_pair(getattr(args, "gape", "2,1"))
    cfg = AlignConfig(
        min_len=args.min_len,
        ext_len=args.ext_len,
        freq_thr=args.freq_thr,
        filter_freq=not getattr(args, "freq_dis", False),
        filter_dir=not getattr(args, "dir_dis", False),
        dir_thr=getattr(args, "dir_thr", 50.0),
        filter_seeds=not getattr(args, "seed_dis", False),
        n_seeds_thr=getattr(args, "seed_thr", 1000),
        left_mem_check=not getattr(args, "chain_dis", False),
        find_orphan=not getattr(args, "orphan_dis", False),
        secondary_chains=getattr(args, "secondary_chains", False),
        postseed=getattr(args, "extend_path", "native"),
        engine=getattr(args, "engine", "tpu"),
        sw=SWParams(smatch=getattr(args, "smatch", 2),
                    smismatch=getattr(args, "smismatch", 4),
                    gapo=gapo, gape=gape, gapo2=gapo2, gape2=gape2),
        chain=ChainConfig(max_dist_x=args.max_dist_x,
                          max_dist_y=args.max_dist_y,
                          max_iter=args.max_iter,
                          max_pred=getattr(args, "max_pred", 5),
                          min_chain_score=args.min_chain_score,
                          min_chain_length=getattr(args, "min_chain_mem", 1)),
    )
    t0 = time.time()
    idx = MoniIndex.load(args.index)
    liftidx = None
    import os
    if os.path.exists(args.index + ".ldx.npz"):
        from .index.liftover import LiftIndex
        liftidx = LiftIndex.load(args.index)
        log("liftover index loaded")
    aligner = Aligner(idx, cfg, liftidx=liftidx)
    log(f"index loaded: n={idx.n} r={idx.r} ({time.time()-t0:.1f}s)")
    return aligner


def cmd_align(args):
    from .align.sam import write_sam_record
    from .io import read_fastq_batches, read_paired_batches
    from .utils import timers

    # multi-host data parallelism (SURVEY.md §2c): deterministic
    # contiguous read ranges per host, per-host SAM shards, merge on
    # host 0 — the reference's per-thread shard scheme across machines.
    # jax.distributed must initialize BEFORE any other JAX use.
    dist_n = getattr(args, "dist_nprocs", 1) or 1
    dist_id = getattr(args, "dist_procid", 0) or 0
    read_lo = read_hi = None
    final_output = args.output
    if dist_n > 1:
        from .parallel import dist as dd
        dd.init_distributed(getattr(args, "dist_coordinator",
                                    "localhost:9981"), dist_n, dist_id)
        total = dd.count_fastq_records(args.mate1 or args.pattern)
        read_lo, read_hi = dd.host_read_range(total, dist_n, dist_id)
        log(f"host {dist_id}/{dist_n}: reads [{read_lo}, {read_hi}) "
            f"of {total}")
        if not args.output:
            raise SystemExit("--dist-nprocs requires -o output")
        args.output = dd.shard_path(final_output, dist_id)

    aligner = _load_aligner(args)
    if getattr(args, "devices", 0) and args.devices > 1:
        mesh = aligner.enable_mesh(args.devices)
        log(f"data-parallel mesh: {mesh.shape}")

    # per-batch checkpoint/resume (SURVEY.md §5: alignment has no mid-run
    # resume in the reference; the sidecar records completed batches)
    ckpt_path = (args.output + ".ckpt.json") if args.output else None
    skip_batches = 0
    resume = bool(getattr(args, "resume", False))
    if resume and ckpt_path and os.path.exists(ckpt_path):
        import json
        ck = json.load(open(ckpt_path))
        skip_batches = ck.get("batches_done", 0)
        # a kill can land between the SAM flush of batch k+1 and its
        # checkpoint write; truncating to the checkpointed byte offset
        # makes resume byte-identical no matter where the kill landed
        if ck.get("bytes_done") is not None and os.path.exists(args.output):
            with open(args.output, "r+b") as tf:
                tf.truncate(int(ck["bytes_done"]))
        log(f"resuming after {skip_batches} completed batches")
    out = (open(args.output, "a" if skip_batches else "w")
           if args.output else sys.stdout)
    if not skip_batches and dist_n <= 1:
        out.write(aligner.header())   # dist: header written at merge

    def range_limit(gen):
        """Clip a batch stream to this host's record range [lo, hi)."""
        if read_lo is None:
            yield from gen
            return
        seen = 0
        for batch in gen:
            b_lo, b_hi = seen, seen + len(batch)
            seen = b_hi
            if b_hi <= read_lo:
                continue
            if b_lo >= read_hi:
                break
            yield batch[max(0, read_lo - b_lo):
                        min(len(batch), read_hi - b_lo)]

    def range_limit_pairs(gen):
        if read_lo is None:
            yield from gen
            return
        seen = 0
        for b1, b2 in gen:
            b_lo, b_hi = seen, seen + len(b1)
            seen = b_hi
            if b_hi <= read_lo:
                continue
            if b_lo >= read_hi:
                break
            s = slice(max(0, read_lo - b_lo),
                      min(len(b1), read_hi - b_lo))
            yield b1[s], b2[s]

    def checkpoint(batches_done):
        if ckpt_path:
            import json
            with open(ckpt_path + ".tmp", "w") as f:
                json.dump({"batches_done": batches_done,
                           "bytes_done": out.tell()}, f)
            os.replace(ckpt_path + ".tmp", ckpt_path)

    def pad_batch(batch):
        # pad ragged final batches so every device keeps a full shard
        # (and XLA keeps one compiled program); __pad__ records dropped
        if len(batch) % max(getattr(args, "devices", 1) or 1, 1):
            need = -len(batch) % args.devices
            batch = batch + [("__pad__", "A" * 32, "I" * 32)] * need
        return batch

    csv_fd = None
    if getattr(args, "csv", None):
        from .align.memreport import csv_header, write_csv
        csv_fd = open(args.csv, "w")
        csv_header(csv_fd)
    report = getattr(args, "report_mems", False)
    t0 = time.time()
    n = 0
    bi = 0
    if args.mate2:
        from .align.paired import PairedAligner
        paligner = PairedAligner(aligner)
        batches = range_limit_pairs(read_paired_batches(
            args.mate1, args.mate2, args.batch_size))
        native = (getattr(aligner.cfg, "postseed", "device") == "native"
                  and not report)
        learned = []
        if native:
            # learning phase (mirrors mt_align_worker,
            # align_reads_dispatcher.hpp:159-183): buffer batches while
            # the insert model learns, then align them with the final
            # model before streaming the rest
            for b1, b2 in batches:
                b1, b2 = pad_batch(b1), pad_batch(b2)
                learned.append((b1, b2))
                if paligner.learn_pair_batch(b1, b2):
                    break
            if dist_n > 1:
                from .parallel import dist as dd
                dd.allreduce_welford(paligner.ins, dist_n)
            log(f"insert model: n={paligner.ins.count} "
                f"mean={paligner.ins.mean:.1f} "
                f"std={paligner.ins.std_dev:.2f}")

        def pe_batches():
            for p in learned:
                yield p
            for b1, b2 in batches:
                yield pad_batch(b1), pad_batch(b2)

        use_fast_pe = native and not csv_fd
        from collections import deque
        pe_subq, pe_begq = deque(), deque()  # (payload, batch_idx, nreal)

        def finish_pe(p):
            nonlocal n
            st, pbi, nreal = p
            sam, _ = paligner.finish_complete_pair_sam(st)
            text = sam.decode()
            lines = text.splitlines(keepends=True)
            if 2 * nreal < len(lines):   # drop trailing __pad__ pairs
                text = "".join(lines[:2 * nreal])
            out.write(text)
            out.flush()
            checkpoint(pbi)
            n += nreal
            log(f"{n} pairs, {n/(time.time()-t0):.0f} pairs/s")

        for b1, b2 in pe_batches():
            bi += 1
            if bi <= skip_batches:
                continue
            if use_fast_pe:
                # 2-deep pipeline, same order as the SE loop: submit
                # k+1, begin k (pull + plan + extz dispatch), finish
                # k-1 (resolve + SAM) — one batch deeper than round
                # 4's so the device never idles during the host plan
                nreal = sum(1 for r in b1 if r[0] != "__pad__")
                pe_subq.append((paligner.submit_pair_batch(b1, b2), bi,
                                nreal))
                if len(pe_subq) >= 2:
                    h, pbi, pn = pe_subq.popleft()
                    pe_begq.append((paligner.begin_complete_pair_sam(h),
                                    pbi, pn))
                if len(pe_begq) >= 2:
                    finish_pe(pe_begq.popleft())
                continue
            recs = (paligner.report_mems_pair_batch(b1, b2) if report
                    else paligner.align_pair_batch(b1, b2))
            for rec in recs:
                if rec.qname != "__pad__":
                    write_sam_record(out, rec)
            if csv_fd:
                for row in paligner.csv_rows_pair_batch(b1, b2):
                    if row.name != "__pad__":
                        write_csv(csv_fd, row)
            out.flush()
            checkpoint(bi)
            n += len(b1)
            log(f"{n} pairs, {n/(time.time()-t0):.0f} pairs/s")
        while pe_subq:
            h, pbi, pn = pe_subq.popleft()
            pe_begq.append((paligner.begin_complete_pair_sam(h), pbi, pn))
        while pe_begq:
            finish_pe(pe_begq.popleft())
        log(f"done: {paligner.stats}")
    else:
        reads_file = args.mate1 or args.pattern
        use_fast = (not report and not csv_fd
                    and getattr(aligner.cfg, "postseed", "") == "native")
        # 2-deep pipeline (fast path): submit batch k+1 first, then
        # begin batch k (pull + plan; its extz kernels queue BEHIND
        # seed k+1 on the FIFO device queue), then finish batch k-1
        # (resolve + native SAM bytes, overlapping seed k+1 on the
        # host) — the TPU-native analog of the reference's double-
        # buffered reader threads (align_reads_dispatcher.hpp:118-198),
        # one batch deeper so the device never idles during the host
        # plan phase.
        from collections import deque
        subq = deque()   # (handle, batch_index, n_real_reads)
        begq = deque()   # (state, batch_index, n_real_reads)
        batches = range_limit(read_fastq_batches(reads_file,
                                                 args.batch_size))

        def finish_pending(p, pbi, nreal):
            nonlocal n
            sam, _ = aligner.finish_complete_sam(p)
            text = sam.decode()
            if nreal < text.count("\n"):
                # ragged final batch: drop the trailing __pad__ lines
                text = "".join(text.splitlines(keepends=True)[:nreal])
            out.write(text)
            out.flush()
            checkpoint(pbi)
            n += nreal
            log(f"{n} reads, {n/(time.time()-t0):.0f} reads/s")

        for batch in batches:
            bi += 1
            if bi <= skip_batches:
                continue
            nreal = len(batch)
            batch = pad_batch(batch)
            if use_fast:
                subq.append((aligner.submit_batch(batch), bi, nreal))
                if len(subq) >= 2:
                    h, pbi, pn = subq.popleft()
                    begq.append((aligner.begin_complete_sam(h), pbi, pn))
                if len(begq) >= 2:
                    p, pbi, pn = begq.popleft()
                    finish_pending(p, pbi, pn)
                continue
            recs = (aligner.report_mems_batch(batch) if report
                    else aligner.align_batch(batch))
            for rec in recs:
                if rec.qname != "__pad__":
                    write_sam_record(out, rec)
            if csv_fd:
                for row in aligner.csv_rows_batch(
                        batch, getattr(aligner, "last_chains_skipped", None)):
                    if row.name != "__pad__":
                        write_csv(csv_fd, row)
            out.flush()
            checkpoint(bi)
            n += len(batch)
            log(f"{n} reads, {n/(time.time()-t0):.0f} reads/s")
        while subq:
            h, pbi, pn = subq.popleft()
            begq.append((aligner.begin_complete_sam(h), pbi, pn))
        while begq:
            p, pbi, pn = begq.popleft()
            finish_pending(p, pbi, pn)
        log(f"done: {aligner.stats}")
    if args.output:
        out.close()
        if ckpt_path and os.path.exists(ckpt_path):
            os.remove(ckpt_path)
    if dist_n > 1:
        from .parallel import dist as dd
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("monitpu_shard_merge")
        if dist_id == 0:
            dd.merge_shards(final_output, dist_n, aligner.header())
            log(f"merged {dist_n} shards -> {final_output}")
    if csv_fd:
        csv_fd.close()
        log(f"wrote {args.csv}")
    timers.report()


def cmd_ms(args):
    """Matching statistics -> <out>.pointers / <out>.lengths text format
    (reference src/matching_statistics.cpp:531-601)."""
    import numpy as np
    import jax.numpy as jnp
    from .index import MoniIndex
    from .index.alphabet import encode_seq
    from .ops.ms import prepare_tables, ms_pointers_batch, ms_lengths_batch
    from .io import read_fastq_batches

    idx = MoniIndex.load(args.index)
    tables = prepare_tables(idx)
    base = args.output or (args.pattern + ".monitpu")
    fp = open(base + ".pointers", "w")
    fl = open(base + ".lengths", "w")
    for batch in read_fastq_batches(args.pattern, args.batch_size):
        M = max(len(s) for _, s, _ in batch)
        M = max(M, 8)
        B = len(batch)
        reads = np.zeros((B, M), np.int32)
        lens = np.zeros(B, np.int32)
        for b, (_, s, _) in enumerate(batch):
            codes = encode_seq(s)
            reads[b, :len(codes)] = codes
            lens[b] = len(codes)
        ptr = ms_pointers_batch(tables, jnp.asarray(reads), jnp.asarray(lens))
        ln = ms_lengths_batch(tables, jnp.asarray(reads), jnp.asarray(lens),
                              ptr)
        ptr, ln = np.asarray(ptr), np.asarray(ln)
        # LCE pool overflow makes lengths approximate (suffix-shift
        # estimate); detect it exactly like find_mems_batch and warn
        prev = np.pad(ptr, ((0, 0), (1, 0)), constant_values=-2)[:, :M]
        valid = np.arange(M)[None, :] < lens[:, None]
        needy = int((((ptr != prev + 1) & valid)).sum())
        if needy > 96 * B:
            log(f"WARNING: LCE pool overflow ({needy} jump positions > "
                f"{96*B} lanes): some lengths are approximate")
        for b, (name, _, _) in enumerate(batch):
            fp.write(f">{name}\n" + " ".join(map(str, ptr[b, :lens[b]])) + "\n")
            fl.write(f">{name}\n" + " ".join(map(str, ln[b, :lens[b]])) + "\n")
    fp.close()
    fl.close()
    log(f"wrote {base}.pointers / {base}.lengths")


def cmd_extend(args):
    """Legacy single-MEM extension -> SAM (reference src/extend/
    extend_ksw2.cpp + include/extender/extender_ksw2.hpp)."""
    from .align.extender import Extender
    from .align.sam import write_sam_record
    from .io import read_fastq_batches

    aligner = _load_aligner(args)
    ext = Extender(aligner)
    out = open(args.output, "w") if args.output else sys.stdout
    out.write(aligner.header())
    t0 = time.time()
    n = 0
    for batch in read_fastq_batches(args.pattern, args.batch_size):
        for rec in ext.extend_batch(batch):
            write_sam_record(out, rec)
        n += len(batch)
        log(f"{n} reads, {n/(time.time()-t0):.0f} reads/s")
    if args.output:
        out.close()
    log(f"done: {ext.stats}")


def cmd_pseudo_ms(args):
    """Pseudo matching statistics -> <out>.pseudo_lengths text format
    (reference src/spumoni/run_spumoni.cpp:466; spumoni.hpp:355-410).
    Loads the slim threshold-only index if present, else the full one."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from .index.alphabet import encode_seq
    from .ops.spumoni import (pseudo_ms_batch, load_spumoni_tables,
                              prepare_spumoni_tables)
    from .io import read_fastq_batches

    if os.path.exists(args.index + ".spumoni.npz"):
        tables = load_spumoni_tables(args.index)
        log("threshold-only (spumoni) index loaded")
    else:
        from .index import MoniIndex
        tables = prepare_spumoni_tables(MoniIndex.load(args.index))
    base = args.output or (args.pattern + ".monitpu")
    out = open(base + ".pseudo_lengths", "w")
    for batch in read_fastq_batches(args.pattern, args.batch_size):
        M = max(max(len(s) for _, s, _ in batch), 8)
        B = len(batch)
        reads = np.zeros((B, M), np.int32)
        lens = np.zeros(B, np.int32)
        for b, (_, s, _) in enumerate(batch):
            codes = encode_seq(s)
            reads[b, :len(codes)] = codes
            lens[b] = len(codes)
        pl = np.asarray(pseudo_ms_batch(tables, jnp.asarray(reads),
                                        jnp.asarray(lens)))
        for b, (name, _, _) in enumerate(batch):
            out.write(f">{name}\n" +
                      " ".join(map(str, pl[b, :lens[b]])) + "\n")
    out.close()
    log(f"wrote {base}.pseudo_lengths")


def cmd_mems(args):
    """MEM extraction -> <out>.mems text (reference src/mems.cpp:241-280)."""
    import numpy as np
    import jax.numpy as jnp
    from .index import MoniIndex
    from .index.alphabet import encode_seq
    from .ops.ms import prepare_tables, find_mems_batch
    from .io import read_fastq_batches

    idx = MoniIndex.load(args.index)
    tables = prepare_tables(idx)
    base = args.output or (args.pattern + ".monitpu")
    out = open(base + ".mems", "w")
    for batch in read_fastq_batches(args.pattern, args.batch_size):
        M = max(max(len(s) for _, s, _ in batch), 8)
        B = len(batch)
        reads = np.zeros((B, M), np.int32)
        lens = np.zeros(B, np.int32)
        for b, (_, s, _) in enumerate(batch):
            codes = encode_seq(s)
            reads[b, :len(codes)] = codes
            lens[b] = len(codes)
        mp, ml, mi, mc, mctr = find_mems_batch(tables, jnp.asarray(reads),
                                         jnp.asarray(lens),
                                         max_mems=args.max_mems,
                                         min_len=args.min_len)
        mp, ml, mi, mc = map(np.asarray, (mp, ml, mi, mc))
        dropped = int(np.asarray(mctr["lce_dropped"])) + \
            int(np.asarray(mctr["mem_dropped"]))
        if dropped:
            log(f"WARNING: {dropped} truncations (LCE pool / max_mems) — "
                f"output may under-report; raise --max-mems / lce_work")
        for b, (name, _, _) in enumerate(batch):
            pairs = " ".join(f"({mi[b,k]},{ml[b,k]})" for k in range(mc[b]))
            out.write(f">{name}\n{pairs}\n")
    out.close()
    log(f"wrote {base}.mems")


def cmd_split_fa(args):
    from .utils.tools import split_fa
    for p in split_fa(args.reference, args.output):
        log(f"wrote {p}")


def cmd_extract(args):
    from .index import MoniIndex
    from .utils.tools import extract_text
    idx = MoniIndex.load(args.index)
    print(extract_text(idx, args.pos, args.length))


def cmd_ra(args):
    from .index import MoniIndex
    from .utils.tools import random_access
    idx = MoniIndex.load(args.index)
    print(random_access(idx, args.positions))


def cmd_swcheck(args):
    """Kernel-vs-kernel SW comparator (the utils/ksw_ksw2_global.cpp
    analog): cross-validates the TPU fitting-SW kernel (ops/sw.py,
    associative-scan affine DP) against the independent native C++
    implementation (native/swalign.cpp) on random query/window pairs,
    and the native extz kernel against a NumPy corner-score DP."""
    import numpy as np
    import jax.numpy as jnp
    from .ops.sw import sw_fit, SWParams
    from .native import swalign
    from .oracle import ksw2

    rng = np.random.default_rng(args.seed)
    n, Q, T = args.num, args.qlen, args.tlen
    queries = rng.integers(1, 5, size=(n, Q)).astype(np.int32)
    targets = np.zeros((n, T), np.int32)
    for i in range(n):
        t = rng.integers(1, 5, size=T)
        # embed a mutated copy of the query so fits are non-trivial
        off = int(rng.integers(0, T - Q))
        t[off:off + Q] = queries[i]
        p = rng.integers(0, Q, size=max(1, Q // 20))
        t[off + p] = rng.integers(1, 5, size=p.size)
        targets[i] = t
    qlens = np.full(n, Q, np.int32)
    tlens = np.full(n, T, np.int32)
    p = SWParams()

    dev = sw_fit(jnp.asarray(queries), jnp.asarray(qlens),
                 jnp.asarray(targets), jnp.asarray(tlens), p)
    dscore = np.asarray(dev["score"])
    nat = swalign.fit_align_batch(queries.astype(np.int8), qlens,
                                  targets.astype(np.int8), tlens,
                                  np.ones(n, bool), smatch=p.smatch,
                                  smismatch=p.smismatch, gapo=p.gapo,
                                  gape=p.gape)
    nscore = np.asarray(nat["score"])
    bad = np.flatnonzero(dscore != nscore)
    log(f"fitting SW: device vs native scores agree on "
        f"{n - bad.size}/{n}")
    for i in bad[:5]:
        log(f"  MISMATCH lane {i}: device={dscore[i]} native={nscore[i]}")

    # extz corner score vs a NumPy reference DP on small pairs
    mism = 0
    for i in range(min(n, 64)):
        q = queries[i, :32].astype(np.int8)
        t = targets[i, :48].astype(np.int8)
        ez = ksw2.extz(q, t, flags=ksw2.SCORE_ONLY)
        H = np.full(len(t) + 1, 0, np.int64)
        for j in range(len(t)):
            H[j + 1] = -(p.gapo + (j + 1) * p.gape)
        E = np.full(len(t) + 1, -2**28, np.int64)
        for a in range(len(q)):
            Hd = -(p.gapo + a * p.gape) if a else 0
            newH = np.empty_like(H)
            newH[0] = -(p.gapo + (a + 1) * p.gape)
            F = -2**28
            for j in range(len(t)):
                E[j + 1] = max(E[j + 1] - p.gape, H[j + 1] - p.gapo - p.gape)
                F = max(F - p.gape, newH[j] - p.gapo - p.gape)
                sc = 0 if (q[a] in (0, 5) or t[j] in (0, 5)) else (
                    p.smatch if q[a] == t[j] else -p.smismatch)
                newH[j + 1] = max(Hd + sc, E[j + 1], F)
                Hd = H[j + 1]
            H = newH
        if ez["score"] != int(H[-1]):
            mism += 1
    log(f"extz corner score vs NumPy DP: "
        f"{min(n, 64) - mism}/{min(n, 64)} agree")
    if bad.size or mism:
        raise SystemExit(1)
    log("swcheck: OK")


def cmd_visualize(args):
    from .index import MoniIndex
    from .utils.tools import visualize_sam
    idx = MoniIndex.load(args.index)
    out = open(args.output, "w") if args.output else sys.stdout
    visualize_sam(idx, args.sam, out)
    if args.output:
        out.close()


def main(argv=None):
    p = argparse.ArgumentParser(prog="monitpu",
                                description="TPU-native pangenome aligner")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the index")
    b.add_argument("-r", "--reference", required=True)
    b.add_argument("-v", "--vcf", default=None)
    b.add_argument("-S", "--samples", default=None,
                   help="file with sample names, one per line")
    b.add_argument("-H", "--haplotype", default="12",
                   help="1, 2, or 12 (haplotypes to include)")
    b.add_argument("-o", "--output", required=True)
    b.add_argument("--spumoni", action="store_true",
                   help="also save the threshold-only pseudo-MS index")
    b.set_defaults(fn=cmd_build)

    def common_query(a):
        a.add_argument("-i", "--index", required=True)
        a.add_argument("-o", "--output", default=None)
        a.add_argument("-b", "--batch-size", type=int, default=512)
        a.add_argument("-l", "--min-len", type=int, default=25)

    al = sub.add_parser("align", help="align reads")
    common_query(al)
    al.add_argument("-1", "--mate1", default=None)
    al.add_argument("-2", "--mate2", default=None)
    al.add_argument("-p", "--pattern", default=None, help="single-end reads")
    # flag surface mirrors the reference driver (moni.in:740-775)
    al.add_argument("-L", "--ext-len", type=int, default=100)
    al.add_argument("-w", "--max-iter", type=int, default=10)
    al.add_argument("-v", "--max-pred", type=int, default=5)
    al.add_argument("-x", "--max-dist-x", type=int, default=500)
    al.add_argument("-y", "--max-dist-y", type=int, default=100)
    al.add_argument("-k", "--min-chain-mem", type=int, default=1)
    al.add_argument("-j", "--min-chain-score", type=int, default=40)
    al.add_argument("-Z", "--secondary-chains", action="store_true",
                    help="dual-lane secondary chain DP (chain.hpp:442)")
    al.add_argument("-A", "--smatch", type=int, default=2)
    al.add_argument("-B", "--smismatch", type=int, default=4)
    al.add_argument("-O", "--gapo", default="4,13",
                    help="gap open penalty (pair: primary,long-gap)")
    al.add_argument("-E", "--gape", default="2,1",
                    help="gap extension penalty (pair)")
    al.add_argument("-d", "--dir-dis", action="store_true",
                    help="disable direction filtering")
    al.add_argument("-D", "--dir-thr", type=float, default=50.0)
    al.add_argument("-s", "--seed-dis", action="store_true",
                    help="disable per-genome seed occurrence filtering")
    al.add_argument("-S", "--seed-thr", type=int, default=1000)
    al.add_argument("-f", "--freq-dis", action="store_true",
                    help="disable frequency filtering")
    al.add_argument("-F", "--freq-thr", type=float, default=0.5)
    al.add_argument("-a", "--chain-dis", action="store_true",
                    help="disable the check_left_MEM chain heuristic")
    al.add_argument("-u", "--orphan-dis", action="store_true",
                    help="disable orphan recovery (paired-end)")
    al.add_argument("--extend-path", choices=["native"],
                    default="native",
                    help="post-seed path: reference-faithful native "
                         "runtime (default) or all-on-TPU fitting path")
    al.add_argument("--engine", choices=["tpu", "cpu"], default="tpu",
                    help="seed-stage engine: TPU kernels (default) or "
                         "the native CPU fallback/baseline")
    al.add_argument("--dist-nprocs", type=int, default=1,
                    help="multi-host: number of processes/hosts")
    al.add_argument("--dist-procid", type=int, default=0,
                    help="multi-host: this process's id")
    al.add_argument("--dist-coordinator", default="localhost:9981",
                    help="multi-host: jax.distributed coordinator")
    al.add_argument("--report-mems", action="store_true", dest="report_mems",
                    help="write MEM occurrences as SECONDARY records "
                    "instead of aligning")
    al.add_argument("--csv", default=None,
                    help="write per-read MEM statistics CSV to this path")
    al.add_argument("-t", "--devices", type=int, default=1,
                    help="data-parallel device count (reads sharded "
                    "across the mesh; index replicated)")
    al.add_argument("--resume", action="store_true",
                    help="resume from <output>.ckpt.json batch checkpoint")
    al.set_defaults(fn=cmd_align)

    ms = sub.add_parser("ms", help="matching statistics")
    common_query(ms)
    ms.add_argument("-p", "--pattern", required=True)
    ms.set_defaults(fn=cmd_ms)

    ex = sub.add_parser("extend", help="legacy single-MEM extension")
    common_query(ex)
    ex.add_argument("-p", "--pattern", required=True)
    ex.add_argument("-L", "--ext-len", type=int, default=100)
    ex.add_argument("-F", "--freq-thr", type=float, default=0.5)
    ex.add_argument("-w", "--max-iter", type=int, default=10)
    ex.add_argument("-x", "--max-dist-x", type=int, default=500)
    ex.add_argument("-y", "--max-dist-y", type=int, default=100)
    ex.add_argument("-Z", "--min-chain-score", type=int, default=40)
    ex.set_defaults(fn=cmd_extend)

    pm = sub.add_parser("pseudo-ms", help="pseudo matching statistics "
                        "(SPUMONI)")
    common_query(pm)
    pm.add_argument("-p", "--pattern", required=True)
    pm.set_defaults(fn=cmd_pseudo_ms)

    me = sub.add_parser("mems", help="maximal exact matches")
    common_query(me)
    me.add_argument("-p", "--pattern", required=True)
    me.add_argument("--max-mems", type=int, default=16)
    me.set_defaults(fn=cmd_mems)

    sf = sub.add_parser("split-fa", help="split multi-FASTA per sequence")
    sf.add_argument("-r", "--reference", required=True)
    sf.add_argument("-o", "--output", required=True, help="output prefix")
    sf.set_defaults(fn=cmd_split_fa)

    et = sub.add_parser("extract", help="extract text substring")
    et.add_argument("-i", "--index", required=True)
    et.add_argument("-p", "--pos", type=int, required=True)
    et.add_argument("-l", "--length", type=int, required=True)
    et.set_defaults(fn=cmd_extract)

    ra = sub.add_parser("ra", help="random-access probe")
    ra.add_argument("-i", "--index", required=True)
    ra.add_argument("positions", type=int, nargs="+")
    ra.set_defaults(fn=cmd_ra)

    sw = sub.add_parser("swcheck", help="SW kernel cross-validation "
                        "(device vs native vs NumPy; ksw_ksw2_global "
                        "equivalent)")
    sw.add_argument("-n", "--num", type=int, default=512)
    sw.add_argument("--qlen", type=int, default=100)
    sw.add_argument("--tlen", type=int, default=200)
    sw.add_argument("--seed", type=int, default=1)
    sw.set_defaults(fn=cmd_swcheck)

    vz = sub.add_parser("visualize", help="BLAST-like render of a SAM")
    vz.add_argument("-i", "--index", required=True)
    vz.add_argument("-s", "--sam", required=True)
    vz.add_argument("-o", "--output", default=None)
    vz.set_defaults(fn=cmd_visualize)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
