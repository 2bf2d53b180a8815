"""Golden SAM parity: device pipeline + native post-seed runtime vs the
reference-semantics oracle.

The oracle (monitpu/oracle/) transliterates the reference's SE hot path
(include/aligner/aligner_ksw2.hpp:328-521 + chain.hpp + fill_chain) over
monitpu's index; these tests pin every SAM field the reference emits —
FLAG/RNAME/POS/CIGAR/AS/MD/NM/MAPQ/ZS plus the OA (original pangenome
alignment) fields — to the oracle on SNP reads, indel reads,
reverse-complement reads, and a ref+VCF pangenome where liftover
(lift_cigar across indel segments) is exercised. Any drift in the TPU
seed kernels, the native chain DP/selection/fill, or MAPQ fails here.
"""

import gzip

import numpy as np
import pytest

from monitpu.index import build_index, decode_seq
from monitpu.index.alphabet import revcomp_codes
from monitpu.index.pangenome import build_pangenome_index
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.oracle import OracleAligner, OracleParams

FIELDS = ["flag", "rname", "pos", "cigar", "asc", "md", "nm", "mapq",
          "zs", "lift_rname", "lift_pos", "lift_cigar", "lift_md",
          "lift_nm", "unmapped_lft"]


def _assert_parity(drecs, orecs):
    diffs = []
    for d, o in zip(drecs, orecs):
        dm, om = not (d.flag & 4), not (o.flag & 4)
        if dm != om:
            diffs.append((d.qname, "mapped", dm, om))
            continue
        if not dm:
            continue
        for f in FIELDS:
            dv, ov = getattr(d, f), getattr(o, f)
            if dv != ov:
                diffs.append((d.qname, f, dv, ov))
    assert not diffs, f"{len(diffs)} field diffs, first 10: {diffs[:10]}"


@pytest.fixture(scope="module")
def hap_index():
    rng = np.random.default_rng(11)
    base = rng.integers(1, 5, size=30_000, dtype=np.int8)
    seqs = []
    for h in range(3):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 120)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, names=[f"hap{h}" for h in range(3)],
                      already_encoded=True)
    return idx, seqs


def _make_reads(seqs, rng, n, L=120, muts=2, indel=False):
    reads = []
    for i in range(n):
        hap = int(rng.integers(0, len(seqs)))
        start = int(rng.integers(0, len(seqs[hap]) - L - 20))
        codes = seqs[hap][start:start + L].copy()
        for _ in range(muts):
            p = int(rng.integers(5, L - 5))
            codes[p] = ((codes[p] + int(rng.integers(1, 4)) - 1) % 4) + 1
        if indel and i % 3 == 0:
            p = int(rng.integers(20, L - 20))
            if i % 6 == 0:   # insertion of 3 random bases
                codes = np.concatenate(
                    [codes[:p], rng.integers(1, 5, 3, dtype=np.int8),
                     codes[p:]])[:L]
            else:            # deletion of 4 bases
                codes = np.concatenate(
                    [codes[:p], seqs[hap][start + L:start + L + 4],
                     codes[p + 4:]])
        if i % 2:
            codes = revcomp_codes(codes.astype(np.int8))
        reads.append((f"r{i}", decode_seq(codes), "I" * len(codes)))
    return reads


def test_parity_snp_reads(hap_index):
    idx, seqs = hap_index
    rng = np.random.default_rng(5)
    reads = _make_reads(seqs, rng, 40)
    dev = Aligner(idx, AlignConfig(max_occs=64, postseed_threads=4))
    ora = OracleAligner(idx, OracleParams())
    _assert_parity(dev.align_batch(reads),
                   [ora.align_se(*r) for r in reads])


def test_parity_indel_reads(hap_index):
    idx, seqs = hap_index
    rng = np.random.default_rng(6)
    reads = _make_reads(seqs, rng, 36, muts=3, indel=True)
    dev = Aligner(idx, AlignConfig(max_occs=64, postseed_threads=4))
    ora = OracleAligner(idx, OracleParams())
    _assert_parity(dev.align_batch(reads),
                   [ora.align_se(*r) for r in reads])


def test_parity_secondary_chains(hap_index):
    """find_chains_secondary parity (chain.hpp:442-727 dual-lane DP)."""
    idx, seqs = hap_index
    rng = np.random.default_rng(8)
    reads = _make_reads(seqs, rng, 24)
    dev = Aligner(idx, AlignConfig(max_occs=64, postseed_threads=4,
                                   secondary_chains=True))
    ora = OracleAligner(idx, OracleParams(secondary_chains=True))
    _assert_parity(dev.align_batch(reads),
                   [ora.align_se(*r) for r in reads])


@pytest.fixture(scope="module")
def pangenome(tmp_path_factory):
    """ref + VCF (SNPs, insertions, deletions) -> pangenome index with
    real (non-identity) liftover segments."""
    tmp = tmp_path_factory.mktemp("pan")
    rng = np.random.default_rng(13)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, size=8000))
    (tmp / "ref.fa").write_text(
        ">chrT\n" + "\n".join(ref[i:i + 70]
                              for i in range(0, len(ref), 70)) + "\n")
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2"]
    taken = set()
    for _ in range(60):
        p = int(rng.integers(100, len(ref) - 100))
        if any(abs(p - q) < 12 for q in taken):
            continue
        taken.add(p)
        kind = int(rng.integers(0, 3))
        gt1, gt2 = (f"{rng.integers(0,2)}|{rng.integers(0,2)}"
                    for _ in range(2))
        r = ref[p - 1]
        if kind == 0:      # SNP
            alt = "ACGT"[("ACGT".index(r) + 1) % 4]
            lines.append(f"chrT\t{p}\t.\t{r}\t{alt}\t.\tPASS\t.\tGT\t{gt1}\t{gt2}")
        elif kind == 1:    # insertion of 3bp
            ins = "".join("ACGT"[c] for c in rng.integers(0, 4, 3))
            lines.append(f"chrT\t{p}\t.\t{r}\t{r}{ins}\t.\tPASS\t.\tGT\t{gt1}\t{gt2}")
        else:              # deletion of 3bp
            dl = ref[p - 1:p + 3]
            lines.append(f"chrT\t{p}\t.\t{dl}\t{r}\t.\tPASS\t.\tGT\t{gt1}\t{gt2}")
    lines[2:] = sorted(lines[2:], key=lambda l: int(l.split("\t")[1]))
    with gzip.open(tmp / "v.vcf.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    index, liftidx = build_pangenome_index(str(tmp / "ref.fa"),
                                           str(tmp / "v.vcf.gz"))
    return index, liftidx


def test_parity_pangenome_liftover(pangenome):
    """Reads sampled from spliced haplotypes; primary fields are lifted
    to reference coordinates (CIGAR rewritten across indels), OA keeps
    the haplotype alignment — both must match the oracle."""
    index, liftidx = pangenome
    rng = np.random.default_rng(17)
    starts = np.asarray(index.seq_starts)
    text = np.asarray(index.text)
    reads = []
    L = 100
    # haplotype sequences are after the ref contig (index 0)
    for i in range(30):
        s = int(rng.integers(1, len(index.seq_names)))
        lo, hi = int(starts[s]), int(starts[s + 1]) - 1
        start = int(rng.integers(lo, hi - L))
        codes = text[start:start + L].copy()
        p = int(rng.integers(5, L - 5))
        codes[p] = ((codes[p] + 1 - 1) % 4) + 1
        if i % 2:
            codes = revcomp_codes(codes.astype(np.int8))
        reads.append((f"p{i}", decode_seq(codes), "I" * L))
    dev = Aligner(index, AlignConfig(max_occs=64, postseed_threads=4),
                  liftidx=liftidx)
    ora = OracleAligner(index, OracleParams(), liftidx=liftidx)
    drecs = dev.align_batch(reads)
    orecs = [ora.align_se(*r) for r in reads]
    _assert_parity(drecs, orecs)
    # at least some reads must have genuinely rewritten CIGARs/positions
    assert any(r.cigar != r.lift_cigar or r.pos != r.lift_pos
               for r in drecs if not (r.flag & 4))
