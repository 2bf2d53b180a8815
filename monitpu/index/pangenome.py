"""Pangenome index construction from reference FASTA + VCF.

Replaces the reference's PFP pipeline with VCF support (thirdparty pfp++
with -v/-S/-H flags driven by pipeline/moni.in:115-152): each selected
sample x haplotype is spliced from the reference by applying its phased
variants, the liftover segment tables are recorded during splicing
(replacing pfp++'s levioSAM lift emission), and the index text is the
concatenation [ref contigs..., hap sequences...] (so lifted coordinates
land in the ref region, see liftover.py).

VCF handling: SNPs + indels from phased or unphased GTs; symbolic
alleles (<*>, <NON_REF>...) and overlapping records are skipped, like
haplotype splicers generally do. Gzip supported.
"""

from __future__ import annotations

import gzip
import sys

import numpy as np

from .alphabet import encode_seq
from .build import build_index
from .liftover import Liftover, LiftIndex


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def parse_vcf(path, samples=None, contigs=None):
    """-> (sample_names, {contig: [(pos0, ref, [alts], [gt per sample])]}).

    gt entries are (a1, a2) allele indices (None for missing)."""
    variants = {}
    names = []
    with _open(path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.rstrip("\n").split("\t")
                names = cols[9:]
                if samples is not None:
                    keep = [i for i, n in enumerate(names) if n in samples]
                else:
                    keep = list(range(len(names)))
                sel_names = [names[i] for i in keep]
                continue
            cols = line.rstrip("\n").split("\t")
            chrom, pos, _, ref, alt = cols[0], cols[1], cols[2], cols[3], \
                cols[4]
            if contigs is not None and chrom not in contigs:
                continue
            alts = [a for a in alt.split(",")]
            gts = []
            for i in keep:
                gt = cols[9 + i].split(":")[0]
                sep = "|" if "|" in gt else "/"
                parts = gt.split(sep)
                try:
                    a1 = int(parts[0]) if parts[0] != "." else 0
                    a2 = int(parts[1]) if len(parts) > 1 and \
                        parts[1] != "." else a1
                except ValueError:
                    a1 = a2 = 0
                gts.append((a1, a2))
            variants.setdefault(chrom, []).append(
                (int(pos) - 1, ref.upper(), alts, gts))
    return sel_names, variants


def splice_haplotype(ref_codes, variants, sample_i, hap_i):
    """Apply one haplotype's variants to an encoded ref contig.

    Returns (hap_codes, segments) where segments are LOCAL
    (hap_start, ref_start, length, is_ins) tuples."""
    chunks = []
    segments = []
    hpos = 0
    rpos = 0
    n = len(ref_codes)

    def add_m(length, rstart):
        nonlocal hpos
        if length <= 0:
            return
        # merge with previous collinear segment when contiguous
        if segments and not segments[-1][3] and \
                segments[-1][0] + segments[-1][2] == hpos and \
                segments[-1][1] + segments[-1][2] == rstart:
            segments[-1] = (segments[-1][0], segments[-1][1],
                            segments[-1][2] + length, False)
        else:
            segments.append((hpos, rstart, length, False))
        hpos += length

    def add_ins(length, ranchor):
        nonlocal hpos
        if length <= 0:
            return
        segments.append((hpos, max(ranchor - 1, 0), length, True))
        hpos += length

    for pos0, ref, alts, gts in variants:
        allele = gts[sample_i][hap_i]
        if allele == 0 or allele > len(alts):
            continue
        alt = alts[allele - 1]
        if alt.startswith("<") or "*" in alt or not alt.isalpha():
            continue
        if pos0 < rpos:       # overlapping record: skip
            continue
        if pos0 + len(ref) > n:
            continue
        # collinear stretch before the variant
        chunks.append(ref_codes[rpos:pos0])
        add_m(pos0 - rpos, rpos)
        alt_codes = encode_seq(alt.upper())
        chunks.append(alt_codes)
        # leading min(|ref|,|alt|) bases stay collinear (SNP/MNP part);
        # a longer alt is an insertion tail, a longer ref a deletion
        # (expressed by the ref jump to the next collinear segment)
        m_len = min(len(ref), len(alt_codes))
        add_m(m_len, pos0)
        if len(alt_codes) > m_len:       # insertion tail
            add_ins(len(alt_codes) - m_len, pos0 + m_len)
        rpos = pos0 + len(ref)
    chunks.append(ref_codes[rpos:])
    add_m(n - rpos, rpos)
    hap = np.concatenate(chunks) if chunks else ref_codes.copy()
    assert hpos == len(hap), (hpos, len(hap))
    return hap, segments


def build_pangenome_index(ref_fasta, vcf, samples=None, haplotypes="12",
                          contigs=None, log=lambda *a: None):
    """-> (MoniIndex, LiftIndex). Text = [ref contigs] + [haplotypes]."""
    from ..io import read_fasta

    if isinstance(samples, str):
        with open(samples) as f:
            samples = [l.strip() for l in f if l.strip()]
    ref_seqs = read_fasta(ref_fasta)
    if contigs is not None:
        ref_seqs = [(n, s) for n, s in ref_seqs if n in contigs]
    sample_names, variants = parse_vcf(
        vcf, samples, {n for n, _ in ref_seqs})

    hap_list = [int(h) - 1 for h in haplotypes]
    seqs, names, lifts = [], [], []
    for cname, cseq in ref_seqs:
        codes = encode_seq(cseq)
        seqs.append(codes)
        names.append(cname)
        lifts.append(None)  # identity
    # per-contig base offsets inside the final text (computed post-hoc)
    for cname, cseq in ref_seqs:
        codes = encode_seq(cseq)
        cvars = variants.get(cname, [])
        for si, sname in enumerate(sample_names):
            for h in hap_list:
                hap, segs = splice_haplotype(codes, cvars, si, h)
                seqs.append(hap)
                names.append(f"{sname}_H{h+1}_{cname}")
                lifts.append((cname, segs))
                log(f"haplotype {names[-1]}: {len(hap)} bp, "
                    f"{len(segs)} segments")

    index = build_index(seqs, names=names, already_encoded=True)
    starts = np.asarray(index.seq_starts)
    contig_start = {n: int(starts[i]) for i, n in enumerate(names)}
    lift_objs = []
    for i, lf in enumerate(lifts):
        if lf is None:
            lift_objs.append(None)
            continue
        cname, segs = lf
        hap0 = int(starts[i])
        ref0 = contig_start[cname]
        glob = [(hap0 + hs, ref0 + rs, ln, ins) for hs, rs, ln, ins in segs]
        lift_objs.append(Liftover.from_segments(glob))
    return index, LiftIndex(starts, lift_objs)
