"""MAPQ computation, BWA-MEM style.

Ports of the two functions the reference actually uses
(include/aligner/mapq.hpp:146-223): compute_mapq_se_bwa and
compute_mapq_pe_bwa. The Bowtie2 table variant (mapq.hpp:75) is dead code
upstream and intentionally omitted. frac_rep is always 0.0 upstream
(compute_frac_rep early-returns, aligner_ksw2.hpp:1980)."""

import math

MEM_MAPQ_COEF = 30.0


def raw_mapq(diff: int, a: int) -> int:
    return int(6.02 * diff / a + .499)


def compute_mapq_se_bwa(score, score2, rlen, qlen, min_seed_length,
                        match_score, mismatch_score,
                        mapq_coeff_len=50.0, mapq_coeff_fac=int(math.log(50.0)),
                        sub_n=0, seed_cov=0, frac_rep=0.0) -> int:
    l = max(rlen, qlen)
    sub = score2 if score2 else min_seed_length * match_score
    if sub >= score:
        return 0
    identity = 1.0 - (l * match_score - score) / (match_score + mismatch_score) / l
    if score == 0:
        mapq = 0
    elif mapq_coeff_len > 0:
        tmp = 1.0 if l < mapq_coeff_len else mapq_coeff_fac / math.log(l)
        tmp *= identity * identity
        mapq = int(6.02 * (score - sub) / match_score * tmp * tmp + .499)
    else:
        mapq = int(MEM_MAPQ_COEF * (1.0 - sub / score) * math.log(seed_cov)
                   + .499)
        if identity < 0.95:
            mapq = int(mapq * identity * identity + .499)
    if sub_n > 0:
        mapq -= int(4.343 * math.log(sub_n + 1) + .499)
    mapq = max(0, min(60, mapq))
    return int(mapq * (1.0 - frac_rep) + .499)


def compute_mapq_pe_bwa(score, score2, score_un, match_score, sub_n,
                        frac_rep_m1, frac_rep_m2, score_m1, score_m2,
                        score2_m1, score2_m2, mapq_m1, mapq_m2):
    """Returns (pair_mapq, mapq_m1, mapq_m2) — the reference mutates the
    mate mapqs in place (mapq.hpp:186-223)."""
    sub = max(score2, score_un)
    mapq = raw_mapq(score - sub, match_score)
    if sub_n > 0:
        mapq -= int(4.343 * math.log(sub_n + 1) + .499)
    mapq = max(0, min(60, mapq))
    mapq = int(mapq * (1.0 - .5 * (frac_rep_m1 + frac_rep_m2)) + .499)

    if score > score_un:  # paired alignment: mate rescue +40 rule
        mapq_m1 = mapq_m1 if mapq_m1 > mapq else (
            mapq if mapq < mapq_m1 + 40 else mapq_m1 + 40)
        mapq_m2 = mapq_m2 if mapq_m2 > mapq else (
            mapq if mapq < mapq_m2 + 40 else mapq_m2 + 40)
        mapq_m1 = min(mapq_m1, raw_mapq(score_m1 - score2_m1, match_score))
        mapq_m2 = min(mapq_m2, raw_mapq(score_m2 - score2_m2, match_score))
    return mapq, mapq_m1, mapq_m2
