"""Measure device-pipeline vs oracle SAM-field agreement on synthetic reads.

Usage: python tools/paritycheck.py [n_reads] [--indel] [--pe]
Prints per-field agreement rates and sample disagreements.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from monitpu.index import build_index, decode_seq
from monitpu.index.alphabet import revcomp_codes
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.ops.chain import ChainConfig
from monitpu.oracle import OracleAligner, OracleParams
from monitpu.oracle.chainer import ChainParams

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
MUT = 2
INDEL = "--indel" in sys.argv
PE = "--pe" in sys.argv
POSTSEED = "native"

rng = np.random.default_rng(7)
base = rng.integers(1, 5, size=200_000, dtype=np.int8)
seqs = []
for h in range(4):
    s = base.copy()
    p = rng.integers(0, s.size, size=s.size // 100)
    s[p] = rng.integers(1, 5, size=p.size)
    seqs.append(s)
idx = build_index(seqs, names=[f"hap{h}" for h in range(4)], already_encoded=True)

dev = Aligner(idx, AlignConfig(postseed=POSTSEED, max_occs=64))
ora = OracleAligner(idx, OracleParams())

reads = []
L = 120
for i in range(N):
    hap = int(rng.integers(0, 4))
    start = int(rng.integers(0, len(seqs[hap]) - L - 20))
    codes = seqs[hap][start:start + L].copy()
    for _ in range(MUT):
        p = int(rng.integers(5, L - 5))
        codes[p] = ((codes[p] + int(rng.integers(1, 4)) - 1) % 4) + 1
    if INDEL and i % 3 == 0:
        p = int(rng.integers(20, L - 20))
        if i % 6 == 0:
            codes = np.concatenate([codes[:p], rng.integers(1, 5, 3, dtype=np.int8), codes[p:]])[:L]
        else:
            codes = np.concatenate([codes[:p], seqs[hap][start+L:start+L+4], codes[p+4:]])[:L]
    if i % 2:
        codes = revcomp_codes(codes.astype(np.int8))
    reads.append((f"r{i}", decode_seq(codes), "I" * len(codes)))

if PE:
    from monitpu.align.paired import PairedAligner
    from monitpu.oracle.pe import OraclePairedAligner
    pal = PairedAligner(dev)
    pora = OraclePairedAligner(idx)
    b1, b2 = [], []
    for i in range(N):
        hap = int(rng.integers(0, 4))
        ins = int(rng.integers(250, 380))
        start = int(rng.integers(0, len(seqs[hap]) - ins - 40))
        frag = seqs[hap][start:start + ins]
        m1 = frag[:L].copy()
        m2 = revcomp_codes(frag[-L:].copy().astype(np.int8))
        for codes in (m1, m2):
            for _ in range(MUT):
                p = int(rng.integers(5, L - 5))
                codes[p] = ((codes[p] + int(rng.integers(1, 4)) - 1) % 4) + 1
        if INDEL and i % 5 == 1:   # kill m2's MEMs -> orphan path
            for p in range(10, L - 6, 18):
                m2[p:p + 3] = ((m2[p:p + 3] + 1) % 4) + 1
        b1.append((f"p{i}/1", decode_seq(m1), "I" * L))
        b2.append((f"p{i}/2", decode_seq(m2), "I" * L))
    half = N // 3
    pal.learn_pair_batch(b1[:half], b2[:half])
    pora.learn_batch(list(zip(b1[:half], b2[:half])))
    print(f"ins native n={pal.ins.count} mean={pal.ins.mean:.4f}")
    print(f"ins oracle n={pora.ins.count} mean={pora.ins.mean:.4f}")
    drecs = pal.align_pair_batch(b1, b2)
    orecs = []
    for k in range(N):
        o1, o2 = pora.align_pair(b1[k], b2[k])
        orecs.extend([o1, o2])
    FIELDS_PE = ["flag", "rname", "pos", "mapq", "cigar", "pnext", "tlen",
                 "asc", "zs", "md", "nm", "lift_cigar", "lift_md", "seq",
                 "unmapped_lft"]
    bad = 0
    for k, (d, o) in enumerate(zip(drecs, orecs)):
        df = [(f, getattr(d, f), getattr(o, f)) for f in FIELDS_PE
              if getattr(d, f) != getattr(o, f)]
        if df:
            bad += 1
            if bad <= 6:
                print("DIFF", k // 2, "m" + str(k % 2 + 1), df[:4])
    print(f"PE: {2 * N - bad}/{2 * N} mate records fully agree "
          f"(orphans recovered: dev={pal.stats['orphan_recovered']} "
          f"ora={pora.stats['orphan_recovered']})")
    sys.exit(0 if bad == 0 else 1)

drecs = dev.align_batch(reads)
orecs = [ora.align_se(n, s, q) for n, s, q in reads]

fields = ["mapped", "flag", "rname", "pos", "cigar", "AS", "MD", "NM", "MAPQ", "ZS"]
agree = {f: 0 for f in fields}
full = 0
samples = []
for d, o in zip(drecs, orecs):
    dm, om = not (d.flag & 4), not (o.flag & 4)
    agree["mapped"] += dm == om
    row_ok = dm == om
    if dm and om:
        for f, dv, ov in [("flag", d.flag, o.flag), ("rname", d.rname, o.rname),
                          ("pos", d.pos, o.pos), ("cigar", d.cigar, o.cigar),
                          ("AS", d.asc, o.asc), ("MD", d.md, o.md),
                          ("NM", d.nm, o.nm), ("MAPQ", d.mapq, o.mapq),
                          ("ZS", d.zs, o.zs)]:
            eq = dv == ov
            agree[f] += eq
            row_ok = row_ok and eq
    else:
        for f in fields[1:]:
            agree[f] += dm == om
    full += row_ok
    if not row_ok and len(samples) < 8:
        samples.append((d.qname, ("dev", d.flag, d.rname, d.pos, d.cigar, d.asc, d.mapq, d.zs, d.md),
                        ("ora", o.flag, o.rname, o.pos, o.cigar, o.asc, o.mapq, o.zs, o.md)))

print(f"n={N} full-record agreement: {full}/{N} = {full/N:.3f}")
for f in fields:
    print(f"  {f:7s} {agree[f]}/{N} = {agree[f]/N:.3f}")
for s in samples:
    print(*s, sep="\n   ")
