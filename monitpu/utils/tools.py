"""Small utility tools mirroring the reference's utils/ binaries
(reference utils/CMakeLists.txt:11-56):

- split_fa   (utils/split_fa.cpp): split a multi-FASTA into per-sequence
  files.
- extract    (utils/extract.cpp): extract a substring of the indexed
  text — here a slice of the plain text array instead of an SLP
  expandSubstr.
- ra         (utils/ra.cpp): random-access probe — print the characters
  at given positions (SLP charAt equivalent).
- visualize  (utils/visualizer.cpp + print_BLAST_like,
  include/common/common.hpp:578): BLAST-like rendering of SAM
  alignments against the indexed text.
"""

from __future__ import annotations

import re

from ..index.alphabet import decode_seq


def split_fa(fasta_path: str, out_prefix: str) -> list:
    """Split a multi-FASTA into <out_prefix>.<seqname>.fa files."""
    from ..io import read_fasta
    written = []
    for name, seq in read_fasta(fasta_path):
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", name)
        path = f"{out_prefix}.{safe}.fa"
        with open(path, "w") as f:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
        written.append(path)
    return written


def extract_text(index, pos: int, length: int) -> str:
    """T[pos..pos+length) as a string (SLP expandSubstr equivalent)."""
    pos = max(0, min(pos, index.n))
    return decode_seq(index.text[pos:pos + max(0, min(length,
                                                      index.n - pos))])


def random_access(index, positions) -> str:
    """Characters at the given positions (SLP charAt equivalent)."""
    return "".join(extract_text(index, int(p), 1) for p in positions)


_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def blast_like(ref_str: str, query_str: str, cigar: str) -> str:
    """Three-line BLAST-like render of an alignment
    (print_BLAST_like, common.hpp:578; utils/visualizer.cpp). ref_str
    starts at the alignment start; query_str is the full SEQ."""
    t_o, bars, q_o = [], [], []
    q = t = 0
    for ln, op in _CIG_RE.findall(cigar):
        ln = int(ln)
        if op in "M=X":
            for k in range(ln):
                tc, qc = ref_str[t + k], query_str[q + k]
                t_o.append(tc)
                q_o.append(qc)
                bars.append("|" if tc == qc else "*")
            q += ln
            t += ln
        elif op in "IS":
            t_o.append(" " * ln)
            bars.append(" " * ln)
            q_o.append(query_str[q:q + ln].lower() if op == "S"
                       else query_str[q:q + ln])
            q += ln
        elif op in "DN":
            t_o.append(ref_str[t:t + ln])
            bars.append(" " * ln)
            q_o.append("-" * ln)
            t += ln
    return ("".join(t_o) + "\n" + "".join(bars) + "\n" + "".join(q_o)
            + "\n")


def visualize_sam(index, sam_path: str, out, seq_names=None,
                  seq_starts=None):
    """Render every mapped record of a SAM file against the index text."""
    import numpy as np
    names = list(seq_names if seq_names is not None else index.seq_names)
    starts = np.asarray(seq_starts if seq_starts is not None
                        else index.seq_starts)
    for line in open(sam_path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag, rname, pos, cigar, seq = (int(f[1]), f[2], int(f[3]),
                                        f[5], f[9])
        if flag & 4 or cigar == "*" or rname == "*":
            continue
        rlen = sum(int(l) for l, op in _CIG_RE.findall(cigar)
                   if op in "MDN=X")
        gpos = int(starts[names.index(rname)]) + pos - 1
        ref = extract_text(index, gpos, rlen)
        out.write(f">{f[0]} {rname}:{pos} {cigar}\n")
        out.write(blast_like(ref, seq, cigar))
