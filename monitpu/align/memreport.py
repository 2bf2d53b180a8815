"""Report-MEMs mode and per-read CSV MEM statistics.

Reference: the --report_mems arm of the aligner (include/aligner/
aligner_ksw2.hpp:345-373 single-end, :1126-1180 paired) writes one
SECONDARY SAM record per (MEM, occurrence) — seq is the read substring
covered by the MEM, CIGAR "<len>M", position via seqidx — and returns
before chaining. The --csv arm (include/common/csv.hpp; populate_csv,
aligner_ksw2.hpp:1870-1899) logs per-read MEM statistics used for
tuning the seed filters (reference README.md:187-203).

Both consume the seed arrays the device pipeline already produces; the
host pulls them only when one of these opt-in modes is on.

Documented divergence: occurrence counts here are over the retained
occurrence buffer (cap max_occs, ops/occs.py) — a count equal to the
cap means "at least this many". num_mems_filter counts occurrences
dropped by the seed-frequency filter (the reference additionally counts
its per-genome n_seeds_thr filter, which the occurrence cap subsumes).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .sam import SamRecord, SAM_SECONDARY, SAM_REVERSED

MATE_RC = 2


@dataclasses.dataclass
class CsvRow:
    """csv_t equivalent (include/common/csv.hpp:27-52)."""
    name: str = ""
    num_uniq_mems: int = 0
    total_mem_occ: int = 0
    max_mem_freq: float = 0.0
    min_mem_freq: float = 1.0
    high_occ_mem: int = 0
    low_occ_mem: int = 0
    num_mems_filter: int = 0
    num_chains_skipped: int = 0


def write_csv(out, c: CsvRow):
    """Field order and formatting of write_csv (csv.hpp:54-66)."""
    out.write(f"{c.name},{c.num_uniq_mems},{c.total_mem_occ},"
              f"{c.max_mem_freq:f},{c.min_mem_freq:f},{c.high_occ_mem},"
              f"{c.low_occ_mem},{c.num_mems_filter},"
              f"{c.num_chains_skipped}\n")


def csv_header(out):
    out.write("read_name,num_uniq_mems,total_mem_occ,max_mem_freq,"
              "min_mem_freq,high_occ_mem,low_occ_mem,num_mems_filter,"
              "num_chains_skipped\n")


def seed_csv_row(name, valid, cnt, occs, seq_starts, freq_thr=None,
                 chains_skipped=0):
    """CSV stats from one read's flattened seed lanes.

    valid bool[N], cnt int[N], occs int[N, O] (caller concatenates the
    read's orientation/mate lanes along N). Mirrors populate_csv
    (aligner_ksw2.hpp:1870-1899)."""
    row = CsvRow(name=name, num_chains_skipped=chains_skipped)
    live = np.flatnonzero(valid)
    row.num_uniq_mems = int(live.size)
    if not live.size:
        return row
    counts = cnt[live]
    total = int(counts.sum())
    row.total_mem_occ = total
    freqs = counts / max(total, 1)
    row.max_mem_freq = float(freqs.max())
    row.min_mem_freq = float(freqs.min())
    if freq_thr is not None:
        row.num_mems_filter = int(counts[freqs > freq_thr].sum())
    # per-genome occurrence counts (mem_t count_dict, mems.hpp:47-52):
    # genome of an occurrence = searchsorted into seqidx starts
    hi, lo = 0, 0
    for k, s in enumerate(live):
        o = occs[s, :counts[k]]
        g = np.searchsorted(seq_starts, o, side="right") - 1
        per = np.unique(g, return_counts=True)[1]
        mx, mn = int(per.max()), int(per.min())
        hi, lo = (mx, mn) if k == 0 else (max(hi, mx), min(lo, mn))
    row.high_occ_mem, row.low_occ_mem = hi, lo
    return row


def mem_report_lane(seeds, row, mate_code, name, seq, qual, rc_seq,
                    pos_to_ref):
    """SECONDARY SAM records for every (seed, occurrence) of one seed
    lane row (aligner_ksw2.hpp:345-373). mate_code's MATE_RC bit picks
    the rc sequence and sets the REVERSED flag."""
    out = []
    rc = bool(mate_code & MATE_RC)
    use_seq = rc_seq if rc else seq
    use_q = (qual[::-1] if (qual and rc) else qual) or ""
    S = seeds["valid"].shape[1]
    for s in range(S):
        if not seeds["valid"][row, s]:
            continue
        ln = int(seeds["len"][row, s])
        idx = int(seeds["idx"][row, s])
        sub = use_seq[idx:idx + ln]
        subq = use_q[idx:idx + ln] if use_q else "*"
        for k in range(int(seeds["cnt"][row, s])):
            rec = SamRecord(qname=name, seq=sub, qual=subq)
            rname, off = pos_to_ref(int(seeds["occs"][row, s, k]))
            rec.rname = rname
            rec.pos = off + 1
            rec.cigar = f"{ln}M"
            rec.flag = SAM_SECONDARY | (SAM_REVERSED if rc else 0)
            rec.rlen = ln
            out.append(rec)
    return out
