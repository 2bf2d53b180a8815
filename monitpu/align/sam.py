"""SAM records, MD/NM computation and the writer.

Field-for-field mirror of the reference's sam_t / write_sam
(include/common/sam.hpp:47-188) including the custom OA (original
pangenome alignment) and AA (alternative haplotype hits) tags, and of
write_MD_core (sam.hpp:249-287)."""

from __future__ import annotations

import dataclasses

import numpy as np

# SAM flags (sam.hpp:32-43)
SAM_PAIRED = 1
SAM_MAPPED_PAIRED = 2
SAM_UNMAPPED = 4
SAM_MATE_UNMAPPED = 8
SAM_REVERSED = 16
SAM_MATE_REVERSED = 32
SAM_FIRST_IN_PAIR = 64
SAM_SECOND_IN_PAIR = 128
SAM_SECONDARY = 256

_DEC = np.frombuffer(b"$ACGTN", dtype=np.uint8)


@dataclasses.dataclass
class SamRecord:
    qname: str = ""
    flag: int = SAM_UNMAPPED
    rname: str = "*"
    pos: int = 0            # 1-based
    mapq: int = 255
    cigar: str = "*"
    rnext: str = "*"
    pnext: int = 0
    tlen: int = 0
    seq: str = "*"
    qual: str = "*"
    # tags
    asc: int = 0            # AS
    nm: int = 0
    zs: int = 0
    md: str = ""
    rlen: int = 0
    # original (pangenome) alignment for the OA tag
    lift_rname: str = "*"
    lift_pos: int = 0
    lift_cigar: str = "*"
    lift_nm: int = 0
    lift_md: str = ""
    lift_rlen: int = 0
    unmapped_lft: bool = False
    # AA tag
    alt_haplotypes: list = dataclasses.field(default_factory=list)
    alt_pos: list = dataclasses.field(default_factory=list)
    alt_scores: list = dataclasses.field(default_factory=list)


def cigar_ops_to_string(ops) -> str:
    return "".join(f"{l}{op}" for op, l in ops) if ops else "*"


def md_nm_from_ops(ref_codes, read_codes, ops):
    """MD:Z string + NM count from CIGAR ops over code arrays.

    ref_codes starts at the alignment start (tstart); read_codes is the
    full read in aligned orientation. Mirrors write_MD_core semantics:
    NM counts mismatches + inserted + deleted bases."""
    md = []
    l_md = 0
    nm = 0
    q = t = 0
    for op, ln in ops:
        if op == "M":
            for _ in range(ln):
                if read_codes[q] != ref_codes[t]:
                    md.append(f"{l_md}{chr(_DEC[ref_codes[t]])}")
                    l_md = 0
                    nm += 1
                else:
                    l_md += 1
                q += 1
                t += 1
        elif op == "I":
            q += ln
            nm += ln
        elif op == "D":
            md.append(f"{l_md}^" + "".join(
                chr(_DEC[c]) for c in ref_codes[t:t + ln]))
            l_md = 0
            t += ln
            nm += ln
    md.append(str(l_md))
    return "".join(md), nm


def sam_header(seq_names, seq_lens, prog="monitpu", version="0.1.0") -> str:
    out = ["@HD\tVN:1.6\tSO:unknown"]
    for name, ln in zip(seq_names, seq_lens):
        out.append(f"@SQ\tSN:{name}\tLN:{ln}")
    out.append(f"@PG\tID:{prog}\tPN:{prog}\tVN:{version}")
    return "\n".join(out) + "\n"


def write_sam_record(out, s: SamRecord):
    """Text layout identical to the reference's write_sam
    (sam.hpp:144-188)."""
    out.write(f"{s.qname}\t{s.flag}\t{s.rname}\t{s.pos}\t{s.mapq}\t"
              f"{s.cigar}\t{s.rnext}\t{s.pnext}\t{s.tlen}\t{s.seq}\t"
              f"{s.qual if s.qual else '*'}")
    if not (s.flag & SAM_UNMAPPED) or s.unmapped_lft:
        out.write(f"\tAS:i:{s.asc}\tNM:i:{s.nm}")
        if s.zs > 0:
            out.write(f"\tZS:i:{s.zs}")
        out.write(f"\tMD:Z:{s.md}")
        strand = "-" if s.flag & SAM_REVERSED else "+"
        out.write(f"\tOA:Z:{s.lift_rname},{s.lift_pos},{strand},"
                  f"{s.lift_cigar},{s.mapq},{s.lift_nm};")
        out.write("\tAA:Z:")
        for h, p, sc in zip(s.alt_haplotypes, s.alt_pos, s.alt_scores):
            out.write(f"{h},{p},{sc};")
    out.write("\n")
