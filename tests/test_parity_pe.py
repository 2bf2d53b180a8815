"""Golden paired-end SAM parity: native PE runtime vs the PE oracle.

Pins the full PE record set — FLAG/RNAME/POS/MAPQ/CIGAR/PNEXT/TLEN/
AS/ZS/MD/NM, OA fields, strand-applied SEQ/QUAL, and the GATK
unmapped-mate convention — to the reference-semantics PE oracle
(monitpu/oracle/pe.py, transliterating aligner_ksw2.hpp:1000-1326 +
2115-2308 + orphan recovery :1536-1658/2566-2711), including the
insert-model learning gate and orphan-recovery windows.
"""

import numpy as np
import pytest

from monitpu.index import build_index, decode_seq
from monitpu.index.alphabet import revcomp_codes
from monitpu.oracle import OracleParams
from monitpu.oracle.pe import OraclePairedAligner
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.paired import PairedAligner

FIELDS = ["flag", "rname", "pos", "mapq", "cigar", "pnext", "tlen",
          "asc", "zs", "md", "nm", "lift_rname", "lift_pos",
          "lift_cigar", "lift_md", "lift_nm", "seq", "qual",
          "unmapped_lft"]


@pytest.fixture(scope="module")
def pe_setup():
    rng = np.random.default_rng(21)
    base = rng.integers(1, 5, size=40_000, dtype=np.int8)
    seqs = []
    for h in range(3):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 140)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, names=[f"h{i}" for i in range(3)],
                      already_encoded=True)
    return idx, seqs


def make_pairs(seqs, rng, n, L=100, corrupt_every=0):
    b1, b2 = [], []
    for i in range(n):
        hap = int(rng.integers(0, len(seqs)))
        insert = int(rng.integers(250, 360))
        s = int(rng.integers(0, len(seqs[hap]) - insert - 50))
        frag = seqs[hap][s:s + insert]
        m1 = frag[:L].copy()
        m2 = revcomp_codes(frag[-L:].copy())
        for codes in (m1, m2):
            p = int(rng.integers(5, L - 5))
            codes[p] = ((codes[p] + 1 - 1) % 4) + 1
        if corrupt_every and i % corrupt_every == 1:
            # periodic short scrambles: no clean stretch reaches
            # min_len=25 (kills every m2 MEM) but identity stays ~85%,
            # so the orphan window search can still recover the mate
            for p in range(10, L - 6, 18):
                m2[p:p + 3] = ((m2[p:p + 3] + 1) % 4) + 1
        b1.append((f"p{i}/1", decode_seq(m1), "I" * L))
        b2.append((f"p{i}/2", decode_seq(m2), "I" * L))
    return b1, b2


def test_pe_native_vs_oracle(pe_setup):
    idx, seqs = pe_setup
    rng = np.random.default_rng(77)
    ora = OraclePairedAligner(idx, OracleParams())
    pal = PairedAligner(Aligner(idx, AlignConfig(max_occs=64,
                                                 postseed_threads=2)))
    # learning parity: same batch -> bit-identical Welford state
    tb1, tb2 = make_pairs(seqs, rng, 40)
    pal.learn_pair_batch(tb1, tb2)
    ora.learn_batch(list(zip(tb1, tb2)))
    assert pal.ins.count == ora.ins.count
    assert pal.ins.mean == pytest.approx(ora.ins.mean, abs=1e-9)
    assert pal.ins.std_dev == pytest.approx(ora.ins.std_dev, abs=1e-9)

    # alignment parity incl. orphan-recovery pairs
    b1, b2 = make_pairs(seqs, rng, 30, corrupt_every=6)
    recs = pal.align_pair_batch(b1, b2)
    diffs = []
    for k in range(len(b1)):
        o1, o2 = ora.align_pair(b1[k], b2[k])
        for tag, d, o in (("m1", recs[2 * k], o1), ("m2", recs[2 * k + 1],
                                                    o2)):
            for f in FIELDS:
                if getattr(d, f) != getattr(o, f):
                    diffs.append((k, tag, f, getattr(d, f), getattr(o, f)))
    assert not diffs, f"{len(diffs)} diffs, first 10: {diffs[:10]}"
    assert pal.stats["paired_aligned"] >= 22


def test_pe_orphan_recovery_parity(pe_setup):
    """Orphan recovery parity with the direction filter off (-d): the
    corrupted mate keeps no seeds, the clean mate's forward chains win,
    and the mean+-4sigma window search recovers the mate; both engines
    must produce identical records and actually recover some pairs.
    (With the filter on, the reference's dir2-average quirk steers these
    pairs to reverse-lane chains whose window searches the wrong side —
    also reproduced, covered by the test above.)"""
    idx, seqs = pe_setup
    rng = np.random.default_rng(78)
    params = OracleParams(filter_dir=False)
    ora = OraclePairedAligner(idx, params)
    pal = PairedAligner(Aligner(idx, AlignConfig(
        max_occs=64, postseed_threads=2, filter_dir=False)))
    tb1, tb2 = make_pairs(seqs, rng, 40)
    pal.learn_pair_batch(tb1, tb2)
    ora.learn_batch(list(zip(tb1, tb2)))
    b1, b2 = make_pairs(seqs, rng, 24, corrupt_every=4)
    recs = pal.align_pair_batch(b1, b2)
    diffs = []
    for k in range(len(b1)):
        o1, o2 = ora.align_pair(b1[k], b2[k])
        for tag, d, o in (("m1", recs[2 * k], o1), ("m2", recs[2 * k + 1],
                                                    o2)):
            for f in FIELDS:
                if getattr(d, f) != getattr(o, f):
                    diffs.append((k, tag, f, getattr(d, f), getattr(o, f)))
    assert not diffs, f"{len(diffs)} diffs, first 10: {diffs[:10]}"
    assert pal.stats["orphan_recovered"] > 0
    assert pal.stats["orphan_recovered"] == ora.stats["orphan_recovered"]


def test_pe_liftover_parity(tmp_path):
    """PE over a real (non-identity) liftover pangenome: the pair
    distance/AS/MAPQ must be computed from LIFTED mate positions
    (aligner_ksw2.hpp:2174-2182 computes dist after fill_chain rewrote
    score.pos to reference coordinates), and orphan mates lifting into
    insertions must not credit the pair total."""
    import gzip
    from monitpu.index.pangenome import build_pangenome_index
    rng = np.random.default_rng(99)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, size=12000))
    (tmp_path / "ref.fa").write_text(
        ">chrP\n" + "\n".join(ref[i:i + 70]
                              for i in range(0, len(ref), 70)) + "\n")
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    taken = set()
    for _ in range(80):
        p = int(rng.integers(100, len(ref) - 100))
        if any(abs(p - q) < 15 for q in taken):
            continue
        taken.add(p)
        kind = int(rng.integers(0, 3))
        r = ref[p - 1]
        if kind == 0:
            alt = "ACGT"[("ACGT".index(r) + 1) % 4]
            lines.append(f"chrP\t{p}\t.\t{r}\t{alt}\t.\tPASS\t.\tGT\t1|1")
        elif kind == 1:
            ins = "".join("ACGT"[c] for c in rng.integers(0, 4, 4))
            lines.append(f"chrP\t{p}\t.\t{r}\t{r}{ins}\t.\tPASS\t.\tGT\t1|1")
        else:
            dl = ref[p - 1:p + 4]
            lines.append(f"chrP\t{p}\t.\t{dl}\t{r}\t.\tPASS\t.\tGT\t1|1")
    # VCFs are position-sorted by spec; the splicer's overlap rule
    # treats out-of-order records as overlaps
    lines[2:] = sorted(lines[2:], key=lambda l: int(l.split("\t")[1]))
    with gzip.open(tmp_path / "v.vcf.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    index, liftidx = build_pangenome_index(str(tmp_path / "ref.fa"),
                                           str(tmp_path / "v.vcf.gz"))
    text = np.asarray(index.text)
    starts = np.asarray(index.seq_starts)
    # sample pairs from the haplotypes (indexes 1..2: S1_H1/H2)
    b1, b2 = [], []
    L = 90
    for i in range(24):
        s_idx = int(rng.integers(1, len(index.seq_names)))
        lo, hi = int(starts[s_idx]), int(starts[s_idx + 1]) - 1
        ins = int(rng.integers(220, 300))
        s = int(rng.integers(lo, hi - ins - 10))
        frag = text[s:s + ins]
        m1 = frag[:L].copy()
        m2 = revcomp_codes(frag[-L:].copy().astype(np.int8))
        b1.append((f"q{i}/1", decode_seq(m1.astype(np.int8)), "I" * L))
        b2.append((f"q{i}/2", decode_seq(m2), "I" * L))
    ora = OraclePairedAligner(index, OracleParams(), liftidx=liftidx)
    pal = PairedAligner(Aligner(index, AlignConfig(max_occs=64,
                                                   postseed_threads=2),
                                liftidx=liftidx))
    pal.learn_pair_batch(b1, b2)
    ora.learn_batch(list(zip(b1, b2)))
    recs = pal.align_pair_batch(b1, b2)
    diffs = []
    for k in range(len(b1)):
        o1, o2 = ora.align_pair(b1[k], b2[k])
        for tag, d, o in (("m1", recs[2 * k], o1),
                          ("m2", recs[2 * k + 1], o2)):
            for f in FIELDS:
                if getattr(d, f) != getattr(o, f):
                    diffs.append((k, tag, f, getattr(d, f), getattr(o, f)))
    assert not diffs, f"{len(diffs)} diffs: {diffs[:10]}"
    # the batch must exercise real CIGAR rewrites under lift
    assert any(r.cigar != r.lift_cigar for r in recs if not (r.flag & 4))
