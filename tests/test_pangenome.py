"""Pangenome construction (ref+VCF) and liftover correctness."""

import gzip

import numpy as np
import pytest

from monitpu.index.alphabet import encode_seq, decode_seq
from monitpu.index.pangenome import (parse_vcf, splice_haplotype,
                                     build_pangenome_index)
from monitpu.index.liftover import Liftover, LiftIndex

REF = "ACGTACGTGGCCAATTACGTACGTGGCCAATTACGTACGT"  # 40 bp

VCF = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2
chr1\t5\t.\tA\tG\t.\tPASS\t.\tGT\t1|0\t0|0
chr1\t12\t.\tCA\tC\t.\tPASS\t.\tGT\t1|1\t0|1
chr1\t20\t.\tT\tTTTG\t.\tPASS\t.\tGT\t0|1\t1|0
chr1\t30\t.\tA\t<*>\t.\tPASS\t.\tGT\t1|1\t1|1
"""


@pytest.fixture()
def vcf_files(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(f">chr1\n{REF}\n")
    vcf = tmp_path / "x.vcf.gz"
    with gzip.open(vcf, "wt") as f:
        f.write(VCF)
    return str(ref), str(vcf)


def test_parse_vcf(vcf_files):
    _, vcf = vcf_files
    names, variants = parse_vcf(vcf)
    assert names == ["S1", "S2"]
    v = variants["chr1"]
    assert len(v) == 4
    assert v[0] == (4, "A", ["G"], [(1, 0), (0, 0)])
    assert v[2][1] == "T" and v[2][2] == ["TTTG"]


def test_splice_snp_del_ins(vcf_files):
    _, vcf = vcf_files
    names, variants = parse_vcf(vcf)
    ref = encode_seq(REF)
    # S1 hap1: SNP A5G, del CA12->C; symbolic skipped
    hap, segs = splice_haplotype(ref, variants["chr1"], 0, 0)
    expect = REF[:4] + "G" + REF[5:12] + REF[13:]  # pos4 SNP; del drops pos12
    assert decode_seq(hap) == expect
    lo = Liftover.from_segments(segs)
    # positions before SNP map identity
    for p in range(4):
        assert lo.lift(p) == p
    assert lo.lift(4) == 4          # SNP site still collinear
    # after the deletion (hap pos 12 == ref pos 13)
    assert lo.lift(12) == 13
    assert lo.lift(len(hap) - 1) == len(REF) - 1

    # S2 hap1: ONLY the insertion TTTG at pos 19 (T -> TTTG)
    hap2, segs2 = splice_haplotype(ref, variants["chr1"], 1, 0)
    expect2 = REF[:20] + "TTG" + REF[20:]
    assert decode_seq(hap2) == expect2
    lo2 = Liftover.from_segments(segs2)
    assert lo2.lift(19) == 19
    for p in (20, 21, 22):          # inside insertion -> anchor base
        assert lo2.lift(p) == 19
    assert lo2.lift(23) == 20


def test_lift_cigar_across_indels(vcf_files):
    _, vcf = vcf_files
    names, variants = parse_vcf(vcf)
    ref = encode_seq(REF)
    hap, segs = splice_haplotype(ref, variants["chr1"], 1, 0)  # ins only
    lo = Liftover.from_segments(segs)
    # alignment spanning the insertion: hap[16:28) as 12M
    pos, ops = lo.lift_cigar(16, [("M", 12)])
    assert pos == 16
    # hap 16..19 = ref 16..19 (4M), hap 20..22 ins (3I), hap 23..27 (5M)
    assert ops == [("M", 4), ("I", 3), ("M", 5)]

    hapd, segsd = splice_haplotype(ref, variants["chr1"], 1, 1)  # del only
    lod = Liftover.from_segments(segsd)
    # span the deletion at hap pos 12 (ref 12 deleted): hap[8:16) as 8M
    pos, ops = lod.lift_cigar(8, [("M", 8)])
    assert pos == 8
    assert ops == [("M", 4), ("D", 1), ("M", 4)]


def test_build_pangenome_index_and_align(vcf_files, tmp_path):
    ref, vcf = vcf_files
    idx, lift = build_pangenome_index(ref, vcf, haplotypes="12")
    # sequences: chr1 + 2 samples x 2 haps
    assert idx.num_seqs == 5
    assert idx.seq_names[0] == "chr1"
    assert "S1_H1_chr1" in idx.seq_names

    # global lift: a position inside S1_H1 after its deletion
    s = idx.seq_names.index("S1_H1_chr1")
    hap_start = int(idx.seq_starts[s])
    assert lift.lift(hap_start + 12) == 13  # chr1 starts at 0
    # identity on the ref region
    assert lift.lift(7) == 7

    # round trip
    lift.save(str(tmp_path / "pg"))
    lift2 = LiftIndex.load(str(tmp_path / "pg"))
    assert lift2.lift(hap_start + 12) == 13


def test_align_reports_ref_coords(vcf_files):
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.ops.chain import ChainConfig
    from monitpu.align.sam import SAM_UNMAPPED
    ref, vcf = vcf_files
    # tiny genome: widen it so MEMs exist
    rng = np.random.default_rng(3)
    pad = decode_seq(rng.integers(1, 5, size=400).astype(np.int8))
    import pathlib
    ref2 = pathlib.Path(ref).parent / "ref2.fa"
    ref2.write_text(f">chr1\n{pad}{REF}{pad[::-1]}\n")
    vcf2 = pathlib.Path(ref).parent / "y.vcf"
    vcf2.write_text(VCF.replace("\t5\t", f"\t{405}\t")
                    .replace("\t12\t", f"\t{412}\t")
                    .replace("\t20\t", f"\t{420}\t")
                    .replace("\t30\t", f"\t{430}\t"))
    idx, lift = build_pangenome_index(str(ref2), str(vcf2), haplotypes="12")
    cfg = AlignConfig(min_len=15, max_mems=6, max_occs=16, max_anchors=64,
                      read_pad=64, window=160, margin=24,
                      chain=ChainConfig(min_chain_score=12, max_chains=4,
                                        max_chain_len=16))
    al = Aligner(idx, cfg, liftidx=lift)
    # read sampled from S1_H1 spanning its deletion at ref 411
    s = idx.seq_names.index("S1_H1_chr1")
    hs = int(idx.seq_starts[s])
    read = decode_seq(idx.text[hs + 380:hs + 440])
    recs = al.align_batch([("r0", read, None)])
    rec = recs[0]
    assert not (rec.flag & SAM_UNMAPPED)
    assert rec.rname == "chr1"          # lifted to the reference contig
    assert abs(rec.pos - 381) <= 2
    assert "D" in rec.cigar             # deletion visible in ref coords
    # OA keeps the haplotype coordinates
    assert rec.lift_rname == "S1_H1_chr1"
    assert rec.lift_pos == 381
    assert rec.lift_cigar == "60M"
