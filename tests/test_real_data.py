"""Integration on the reference repo's real mouse chr19 data
(/root/reference/data/mouse): the real VCF (25,617 records, 3 samples,
bcftools-produced INFO/FORMAT columns, multi-allelic sites) through the
pangenome builder, and the real simulated PE reads through the full
align pipeline. The chr19 FASTA is a stripped large blob upstream
(.MISSING_LARGE_BLOBS), so a synthetic backbone stands in — real reads
therefore mostly do not map (they came from the real chr19), which the
pipeline must handle gracefully; the VCF content and read content are
the real-world parsing surface being tested.
"""

import gzip
import os
import pathlib

import numpy as np
import pytest

from monitpu.index.pangenome import parse_vcf, build_pangenome_index
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.paired import PairedAligner

DATA = pathlib.Path("/root/reference/data/mouse")
pytestmark = pytest.mark.skipif(not DATA.exists(),
                                reason="reference data not present")


def test_parse_real_vcf():
    names, variants = parse_vcf(str(DATA / "vcf/mouse.chr19.subset.vcf.gz"))
    assert names == ["129P2_OlaHsd", "129S1_SvImJ", "129S5SvEvBrd"]
    v = variants["chr19"]
    assert len(v) == 25617
    assert sum(1 for x in v if len(x[2]) > 1) > 300   # multi-allelic
    # every record parsed a GT pair per sample
    assert all(len(gts) == 3 and all(len(g) == 2 for g in gts)
               for _, _, _, gts in v[:200])
    # sample selection by file (mouse_samples.txt lists all three)
    with open(DATA / "vcf/mouse_samples.txt") as f:
        subset = [l.strip() for l in f if l.strip()][:2]
    n2, v2 = parse_vcf(str(DATA / "vcf/mouse.chr19.subset.vcf.gz"),
                       samples=set(subset))
    assert n2 == subset


@pytest.fixture(scope="module")
def mouse_pangenome(tmp_path_factory):
    """Real chr19 variants (window 3.05-3.35 Mb, shifted to 0) applied
    to a synthetic backbone: exercises real GT columns, multi-allelic
    records and QUAL/INFO noise through the splicer + liftover."""
    tmp = tmp_path_factory.mktemp("mouse")
    names, variants = parse_vcf(str(DATA / "vcf/mouse.chr19.subset.vcf.gz"))
    lo, hi = 3_050_000, 3_350_000
    shifted = []
    with gzip.open(DATA / "vcf/mouse.chr19.subset.vcf.gz", "rt") as f:
        header = [l for l in f if l.startswith("#")]
    out = tmp / "win.vcf"
    with open(out, "w") as f:
        f.writelines(header)
        with gzip.open(DATA / "vcf/mouse.chr19.subset.vcf.gz", "rt") as g:
            for line in g:
                if line.startswith("#"):
                    continue
                cols = line.split("\t")
                pos = int(cols[1])
                if lo <= pos < hi:
                    cols[1] = str(pos - lo)
                    f.write("\t".join(cols))
    rng = np.random.default_rng(99)
    backbone = "".join("ACGT"[c] for c in rng.integers(
        0, 4, size=hi - lo + 1000))
    ref = tmp / "chr19.fa"
    with open(ref, "w") as f:
        f.write(">chr19\n")
        for i in range(0, len(backbone), 70):
            f.write(backbone[i:i + 70] + "\n")
    index, liftidx = build_pangenome_index(str(ref), str(out))
    return index, liftidx


def test_real_vcf_pangenome_build(mouse_pangenome):
    index, liftidx = mouse_pangenome
    # 1 ref contig + 3 samples x 2 haplotypes
    assert len(index.seq_names) == 7
    assert index.seq_names[0] == "chr19"
    # SNP-only haplotypes stay collinear: lift is offset-preserving
    starts = np.asarray(index.seq_starts)
    for s in range(1, 7):
        h0 = int(starts[s])
        assert liftidx.lift(h0 + 12345) == 12345
    # and the spliced haplotypes actually differ from the backbone
    # (in this VCF the strains' H1 is nearly all-reference; H2 carries
    # ~700-900 SNPs in the window — seq 2 = 129P2_OlaHsd_H2_chr19)
    text = np.asarray(index.text)
    ref_seq = text[:int(starts[1]) - 1]
    hap2 = text[int(starts[2]):int(starts[3]) - 1]
    assert hap2.shape == ref_seq.shape
    assert (hap2 != ref_seq).sum() > 500


def test_real_reads_through_pipeline(mouse_pangenome):
    """The real simulated PE reads (real names, quals, content) must
    flow through learn + align without error; they mostly do not map
    (synthetic backbone), exercising the unmapped/orphan paths."""
    index, liftidx = mouse_pangenome

    def read_fq(path, n):
        out = []
        with open(path) as f:
            while len(out) < n:
                name = f.readline().strip()
                seq = f.readline().strip()
                f.readline()
                qual = f.readline().strip()
                if not name:
                    break
                out.append((name[1:], seq, qual))
        return out

    b1 = read_fq(DATA / "reads/mouse.chr19.R1.fastq", 128)
    b2 = read_fq(DATA / "reads/mouse.chr19.R2.fastq", 128)
    assert len(b1) == len(b2) == 128
    pal = PairedAligner(Aligner(
        index, AlignConfig(engine="cpu", postseed_threads=2),
        liftidx=liftidx))
    pal.learn_pair_batch(b1, b2)
    recs = pal.align_pair_batch(b1, b2)
    assert len(recs) == 256
    # well-formed records: flags paired sanely, qname slash stripped
    for r in recs:
        assert not r.qname.endswith(("/1", "/2"))
        assert r.flag & 4 or r.rname in index.seq_names
    unmapped = sum(1 for r in recs if r.flag & 4)
    assert unmapped > 200  # random backbone: reads must not fake-map
