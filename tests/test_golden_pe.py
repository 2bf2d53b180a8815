"""Hand-derived golden PAIRED-END SAM fixtures (VERDICT r3 item 6).

Like test_golden_sam.py, every expected field is derived BY HAND from
the reference's documented semantics — not by running the pipeline or
the oracle — and each case must be matched by the oracle AND both
engines (TPU kernels, CPU engine). Semantics used:

* pair total: tot = int64(s1 + s2 + .721*ln(2*erfc(|ns|/sqrt2))*smatch
  + .499), ns = (dist - mean)/std, clamped at 0; dist = |p2 - (p1 +
  len1)| over 0-based haplotype positions (aligner_ksw2.hpp:2174-2179;
  at dist == mean the term is +ln(2)*2*.721+.499 = +1.4986 -> +1)
* proper-pair flags: strand 0 -> 99/147, strand 1 -> 83/163
  (aligner_ksw2.hpp:2206-2233)
* TLEN: if pos2 > pos1: tlen = (pos2+len2)-pos1 with signs +/-;
  else tlen = (pos1+len1)-pos2 with signs -/+ — equal positions take
  the ELSE branch, so m1 gets the negative sign (:2216-2231)
* both-mapped mates print AS:i:<pair tot> and ZS:i:<second-best tot>
  (s1.asc = s2.asc = score.tot, :2237-2247)
* GATK unmapped-mate convention: the unmapped mate inherits RNAME/POS/
  MAPQ of the mapped one, CIGAR '*', TLEN 0, PNEXT = mapped POS; flags
  73/133 for mapped-m1 (:2263-2288)
* orphan recovery: window = rm + (mean +- 4*std); the orphan mate's
  AS is the window-global extz score, not the pair total when both
  mates map the pair branch applies (:2566-2711, 2470-2555)
* SE-mapq inputs saturate 60 for identity-1 60 bp mates (see
  test_golden_sam.py header); the PE cap/rescue rules keep 60
* min_score per mate = int(20 + 8*ln(60)) = 52; pair = 104
"""

import io
import math

import numpy as np
import pytest

from monitpu.index import build_index
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.paired import PairedAligner
from monitpu.align.sam import write_sam_record
from monitpu.index.alphabet import decode_seq, revcomp_codes
from monitpu.oracle import OracleParams
from monitpu.oracle.pe import OraclePairedAligner

L = 60


@pytest.fixture(scope="module")
def ref_setup():
    rng = np.random.default_rng(20260821)
    ref = rng.integers(1, 5, size=3000, dtype=np.int8)
    # G6 plants BOTH mates' segments twice (disjoint anchors, so two
    # full paired chains exist — duplicating only one mate's segment
    # yields a shared-anchor chain that prefix-splits into an unpaired
    # stub): pair A = (1200, 1420) dist 160, pair B = (2000, 2360)
    # dist 300; within-pair gaps 160/300 <= max_dist_x 500, cross-pair
    # gaps ~1100 > 500 cannot chain
    ref[2000:2060] = ref[1200:1260]
    ref[2360:2420] = ref[1420:1480]
    idx = build_index([ref], names=["ref"], already_encoded=True)
    return idx, ref


def _set_ins(obj, mean, std, n=50):
    """Pin the insert model to an exact (mean, std): count=50,
    m2 = 50*std^2 (std_dev = sqrt(m2/count))."""
    obj.count = n
    obj.mean = float(mean)
    obj.m2 = float(n * std * std)
    obj.complete = True


def _engines(idx, mean, std, min_len=25):
    pal_tpu = PairedAligner(Aligner(idx, AlignConfig(
        postseed_threads=2, min_len=min_len)))
    pal_cpu = PairedAligner(Aligner(idx, AlignConfig(
        engine="cpu", postseed_threads=2, min_len=min_len)))
    ora = OraclePairedAligner(idx, OracleParams(min_len=min_len))
    for o in (pal_tpu.ins, pal_cpu.ins, ora.ins):
        _set_ins(o, mean, std)
    return pal_tpu, pal_cpu, ora


def _lines(pal, b1, b2):
    recs = pal.align_pair_batch(b1, b2)
    out = io.StringIO()
    for r in recs:
        write_sam_record(out, r)
    return out.getvalue().splitlines()


def _all_lines(idx, b1, b2, mean, std, min_len=25):
    """[(engine, lines)] for both engines + the oracle."""
    pal_tpu, pal_cpu, ora = _engines(idx, mean, std, min_len)
    res = [("tpu", _lines(pal_tpu, b1, b2)),
           ("cpu", _lines(pal_cpu, b1, b2))]
    out = io.StringIO()
    for r1, r2 in (ora.align_pair(a, b) for a, b in zip(b1, b2)):
        write_sam_record(out, r1)
        write_sam_record(out, r2)
    res.append(("oracle", out.getvalue().splitlines()))
    return res


def pair(name, m1_codes, m2_codes):
    return ((f"{name}/1", decode_seq(np.asarray(m1_codes, np.int8)),
             "I" * L),
            (f"{name}/2", decode_seq(np.asarray(m2_codes, np.int8)),
             "I" * L))


def test_golden_proper_fr(ref_setup):
    """Exact FR pair: m1 fwd @100, m2 = rc(ref[200:260)).
    dist = |200-160| = 40 = mean -> tot = 120+120+1 = 241.
    flags 99/147, POS 101/201, TLEN +160/-160, PNEXT crossed,
    AS:i:241 both, MAPQ 60, MD 60, NM 0, no ZS."""
    idx, ref = ref_setup
    r1, r2 = pair("g1", ref[100:160], revcomp_codes(ref[200:260].copy()))
    for eng, lines in _all_lines(idx, [r1], [r2], mean=40, std=10):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g1", "99", "ref", "101", "60", "60M", "=",
                          "201", "160"], (eng, f1)
        assert f2[:9] == ["g1", "147", "ref", "201", "60", "60M", "=",
                          "101", "-160"], (eng, f2)
        for ln in lines[:2]:
            assert "\tAS:i:241\t" in ln, (eng, ln)
            assert "\tNM:i:0\t" in ln, (eng, ln)
            assert "\tMD:Z:60\t" in ln, (eng, ln)
            assert "ZS:i:" not in ln, (eng, ln)


def test_golden_proper_rf_strand1(ref_setup):
    """Same fragment entered reversed: m1 = rc(ref[200:260)), m2 =
    ref[100:160) -> strand 1, flags 83/163, POS 201/101, TLEN
    -160/+160; dist = |100 - (200+60)| = 160 = mean -> AS 241."""
    idx, ref = ref_setup
    r1, r2 = pair("g2", revcomp_codes(ref[200:260].copy()), ref[100:160])
    for eng, lines in _all_lines(idx, [r1], [r2], mean=160, std=10):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g2", "83", "ref", "201", "60", "60M", "=",
                          "101", "-160"], (eng, f1)
        assert f2[:9] == ["g2", "163", "ref", "101", "60", "60M", "=",
                          "201", "160"], (eng, f2)
        for ln in lines[:2]:
            assert "\tAS:i:241\t" in ln, (eng, ln)


def test_golden_overlapping_pair(ref_setup):
    """Insert (80) barely longer than the reads: the mates overlap by
    40 bp yet still form a proper pair. dist = |p2 - (p1+len1)| =
    |ins - 2L| = 40 = mean -> tot = 241; TLEN = (121+60)-101 = 80 with
    the usual +/- split (pos2 > pos1). (A fragment of exactly L — both
    mates at equal positions — cannot pair at all: the chainer needs
    ref progression between mate anchors, so such pairs fall to the
    orphan path; covered implicitly by g4's window arithmetic.)"""
    idx, ref = ref_setup
    r1, r2 = pair("g3", ref[100:160], revcomp_codes(ref[120:180].copy()))
    for eng, lines in _all_lines(idx, [r1], [r2], mean=40, std=10):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g3", "99", "ref", "101", "60", "60M", "=",
                          "121", "80"], (eng, f1)
        assert f2[:9] == ["g3", "147", "ref", "121", "60", "60M", "=",
                          "101", "-80"], (eng, f2)
        for ln in lines[:2]:
            assert "\tAS:i:241\t" in ln, (eng, ln)


def test_golden_gatk_unmapped_mate(ref_setup):
    """GATK unmapped-mate convention through the orphan path, with
    every number pinned. m1 is 100 bp with one SNP at read pos 50 ->
    TWO MEMs (50 + 49; a lone MEM would be eaten by the freq filter:
    a single seed carries 100% > 50% of occurrences). m1 chain score =
    50*2 - 4 + 49*2 = 194; min1 = int(20+8*ln(100)) = 56. m2 (60 bp)
    applied = ref[500:524) then 36 bases each differing from ref at
    their offset: 24 < min_len, so m2 has no seeds (true orphan).
    Window (mean 100, std 25) = rm=399 + [0, 200]. Local trim: the 24
    matches (score 48). Global extz 60q over the 24 bp window: #I = 36
    forced -> 48 - (4 + 72) = -28; tot = int64(194 - 28 + 1.4986) =
    167 >= min1+min2 = 108 -> recovery fires, but -28 < min2 = 52 ->
    ok1-only: GATK convention. m2 inherits RNAME/POS/MAPQ of m1,
    CIGAR '*', TLEN 0, both PNEXT = POS(m1); flags 73/133; m1 keeps
    its own alignment: AS:i:194, NM:i:1, MD 50X49, MAPQ 60 (identity
    .99 saturates), no ZS; the unmapped mate line carries no tag
    block (write_sam gates on flag 4)."""
    idx, ref = ref_setup
    dec = "$ACGTN"
    m1 = ref[300:400].copy()
    m1[50] = (m1[50] % 4) + 1
    md1 = f"50{dec[int(ref[350])]}49"
    m2app = np.concatenate([
        ref[500:524], ((ref[524:560] % 4) + 1).astype(np.int8)])
    r1 = ("g4/1", decode_seq(m1), "I" * 100)
    r2 = ("g4/2", decode_seq(revcomp_codes(m2app)), "I" * L)
    for eng, lines in _all_lines(idx, [r1], [r2], mean=100, std=25):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g4", "73", "ref", "301", "60", "100M", "=",
                          "301", "0"], (eng, f1)
        assert f2[:9] == ["g4", "133", "ref", "301", "60", "*", "=",
                          "301", "0"], (eng, f2)
        assert "\tAS:i:194\t" in lines[0] and "ZS:i:" not in lines[0], \
            (eng, lines[0])
        assert "\tNM:i:1\t" in lines[0], (eng, lines[0])
        assert f"\tMD:Z:{md1}\t" in lines[0], (eng, lines[0], md1)
        assert "AS:i:" not in lines[1], (eng, lines[1])


def test_golden_orphan_recovery(ref_setup):
    """m1 exact @600; m2 = rc of ref[700:760) with interior SNPs at
    segment offsets 10,20,30,40,50 — every clean stretch < min_len 25,
    so m2 contributes no seeds and the pair must be recovered through
    the mean+-4*std window (mean 40, std 25 -> window [rm-60, rm+140]
    covers [700,760)). Orphan alignment: 55 matches, 5 mismatches ->
    score 90; tot = int64(120+90+1.4986) = 211 >= 104. Both mates then
    map: flags 99/147, POS 601/701, TLEN +160/-160, AS:i:211 both,
    NM 5 on m2 with a 10-9-9-9-9-9 MD ladder of the original bases."""
    idx, ref = ref_setup
    seg = ref[700:760].copy()
    dec = "$ACGTN"
    md = ["10"]
    for off in (10, 20, 30, 40, 50):
        md.append(dec[int(ref[700 + off])])
        md.append("9")
        seg[off] = (seg[off] % 4) + 1   # 1..4 -> different base
    md = "".join(md)
    r1, r2 = pair("g5", ref[600:660], revcomp_codes(seg))
    for eng, lines in _all_lines(idx, [r1], [r2], mean=40, std=25):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g5", "99", "ref", "601", "60", "60M", "=",
                          "701", "160"], (eng, f1)
        assert f2[:9] == ["g5", "147", "ref", "701", "60", "60M", "=",
                          "601", "-160"], (eng, f2)
        assert "\tAS:i:211\t" in lines[0], (eng, lines[0])
        assert "\tAS:i:211\t" in lines[1], (eng, lines[1])
        assert "\tNM:i:5\t" in lines[1], (eng, lines[1])
        assert f"\tMD:Z:{md}\t" in lines[1], (eng, lines[1], md)


def test_golden_insert_penalty_tiebreak(ref_setup):
    """Both mates' segments exist twice (fixture planting), giving two
    DISJOINT full paired chains with equal alignment scores and
    different insert distances: pair A = (1200, 1420) dist 160, pair B
    = (2000, 2360) dist 300. With mean 160, std 20: A scores tot =
    241; B pays the Gaussian term at ns = 7 and lands second-best —
    the selection must pick A (POS 1201/1421, TLEN +-280) and surface
    B's tot as ZS. Per-mate second-best scores equal the best (120 ==
    120), so the BWA PE cap drives MAPQ to 0 on both mates — the
    multi-placement ambiguity signal (mapq.hpp:186-223): sub >= score
    makes the SE term 0, and min(.., raw_mapq(0)) caps the +40 rescue
    at 0. The equal-score placements also surface as AA entries
    (check_max_score appends ties with the running max)."""
    idx, ref = ref_setup
    r1, r2 = pair("g6", ref[1200:1260],
                  revcomp_codes(ref[1420:1480].copy()))
    # second-best pair total from the documented closed form (computed
    # from the formula, independent of any pipeline code)
    far = int(120 + 120 + 0.721 * math.log(2.0 * math.erfc(
        7.0 * (2 ** -0.5))) * 2 + 0.499)
    assert 104 <= far < 241
    for eng, lines in _all_lines(idx, [r1], [r2], mean=160, std=20):
        f1, f2 = lines[0].split("\t"), lines[1].split("\t")
        assert f1[:9] == ["g6", "99", "ref", "1201", "0", "60M", "=",
                          "1421", "280"], (eng, f1)
        assert f2[:9] == ["g6", "147", "ref", "1421", "0", "60M", "=",
                          "1201", "-280"], (eng, f2)
        assert "\tAS:i:241\t" in lines[0], (eng, lines[0])
        assert f"\tZS:i:{far}\t" in lines[0], (eng, far, lines[0])
        assert ",120;" in lines[0].split("AA:Z:")[1], (eng, lines[0])
        assert ",120;" in lines[1].split("AA:Z:")[1], (eng, lines[1])
