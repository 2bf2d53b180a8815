"""Pangenome-scale index build demonstration (VERDICT r2 item 3).

Builds a >= 2.5 Gbp multi-haplotype index through the 64-bit path
(int64 SA-IS -> int64 tables), reports build time / peak RSS / table
bytes, then aligns a batch of sampled reads against it with the 64-bit
CPU engine and checks truth positions. Results are recorded in
BASELINE.md.

Usage: python tools/bigbuild.py [contig_Gbp] [n_haps]
(defaults 0.15 x 17 haplotypes = 2.55 Gbp of indexed text — a
chromosome-scale contig times many haplotypes, the realistic pangenome
shape: r grows with the base contig + edits, not with n, so the
run-length tables stay RAM-sized where random text would not)
"""

import resource
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

GBP = float(sys.argv[1]) if len(sys.argv) > 1 else 0.15
HAPS = int(sys.argv[2]) if len(sys.argv) > 2 else 17


def log(*a):
    print(f"[{time.time()-T0:8.1f}s]", *a, flush=True)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


T0 = time.time()
rng = np.random.default_rng(42)
n = int(GBP * 1e9)
log(f"generating {GBP} Gbp base + {HAPS - 1} mutated haplotype(s)")
base = rng.integers(1, 5, size=n, dtype=np.int8)
seqs = [base]
for h in range(1, HAPS):
    s = base.copy()
    p = rng.integers(0, n, size=n // 1000)
    s[p] = rng.integers(1, 5, size=p.size)
    seqs.append(s)
log(f"text ready ({sum(x.size for x in seqs)/1e9:.2f} Gbp), "
    f"rss={rss_gb():.1f} GB")

import os  # noqa: E402

from monitpu.index import MoniIndex  # noqa: E402
from monitpu.index.stream_build import build_index_streaming  # noqa: E402

PREFIX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "bigbuild")
t0 = time.time()
# round-5 streaming build: disk-spilled SA/LCP + in-place PLCP + tables
# written to the npz one at a time — peak RSS ~10 B/position vs the
# direct builder's measured 47 (index/stream_build.py; equality with
# build_index pinned by tests/test_stream_build.py)
stats = build_index_streaming(
    seqs, names=[f"hap{h}" for h in range(HAPS)], out_prefix=PREFIX,
    already_encoded=True, force_wide=GBP * HAPS < 2.0, log=log)
build_s = time.time() - t0
build_rss = rss_gb()
log(f"index built: n={stats['n']} ({stats['n']/1e9:.2f} G) "
    f"r={stats['r']} n/r={stats['n']/stats['r']:.1f} in {build_s:.0f}s, "
    f"BUILD peak rss={build_rss:.1f} GB "
    f"({build_rss*1e9/stats['n']:.1f} B/position)")

idx = MoniIndex.load(PREFIX)
log(f"index loaded for serving: tables={idx.nbytes()/1e9:.1f} GB "
    f"dtype={idx.run_starts.dtype}, rss={rss_gb():.1f} GB")
assert idx.run_starts.dtype == np.int64, "expected the 64-bit path"

# align sampled reads via the 64-bit CPU engine
from monitpu.align.aligner import Aligner, AlignConfig  # noqa: E402
from monitpu.index.alphabet import decode_seq, revcomp_codes  # noqa: E402

starts = np.asarray(idx.seq_starts)
reads, truth = [], []
for i in range(2048):
    hap = int(rng.integers(0, HAPS))
    lo, hi = int(starts[hap]), int(starts[hap + 1]) - 160
    s = int(rng.integers(lo, hi))
    codes = idx.text[s:s + 150].copy()
    codes[rng.integers(0, 150, 2)] = rng.integers(1, 5, 2)
    if rng.random() < 0.5:
        codes = revcomp_codes(codes)
    reads.append((f"r{i}", decode_seq(codes), "I" * 150))
    truth.append((hap, s - lo))

al = Aligner(idx, AlignConfig(engine="cpu", postseed_threads=2))
al.align_batch(reads[:64])      # warm
t0 = time.time()
recs = al.align_batch(reads)
dt = time.time() - t0
aligned = sum(not (r.flag & 4) for r in recs)
names = list(idx.seq_names)
ok = 0
for r, (hap, off) in zip(recs, truth):
    if not (r.flag & 4) and abs((r.pos - 1) - off) <= 20:
        # multi-haplotype: position match on any hap counts (no lift
        # tables in this synthetic; haps are SNP-only so offsets agree)
        ok += 1
log(f"aligned {aligned}/{len(reads)} reads in {dt:.1f}s "
    f"({len(reads)/dt:.0f} reads/s on 2 CPU cores), "
    f"truth-pos ok {ok}/{aligned}, final rss={rss_gb():.1f} GB")
print(f"RESULT n={idx.n} r={idx.r} build_s={build_s:.0f} "
      f"build_peak_rss_gb={build_rss:.1f} "
      f"serve_peak_rss_gb={rss_gb():.1f} tables_gb={idx.nbytes()/1e9:.2f} "
      f"aligned={aligned}/{len(reads)} acc={ok/max(aligned,1):.4f}")
