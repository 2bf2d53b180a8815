"""--report_mems and --csv modes (aligner_ksw2.hpp:345-373,
populate_csv :1870-1899, csv.hpp)."""

import io

import numpy as np

from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.sam import SAM_SECONDARY, SAM_REVERSED
from monitpu.align.memreport import write_csv, csv_header
from monitpu.index.alphabet import decode_seq, revcomp_codes, encode_seq
from monitpu.ops.chain import ChainConfig

from test_extender import make_extender


def make_aligner(rng):
    idx, ext = make_extender(rng)
    return idx, ext.al


def test_report_mems_records(rng):
    idx, al = make_aligner(rng)
    t = idx.text
    reads = []
    starts = []
    for i in range(6):
        s = int(rng.integers(0, idx.n - 70))
        codes = t[s:s + 60].astype(np.int8).copy()
        codes[codes == 0] = 1
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append((f"m{i}", decode_seq(codes), "I" * 60))
        starts.append(s)
    recs = al.report_mems_batch(reads)
    assert recs, "exact reads must report MEMs"
    for r in recs:
        assert r.flag & SAM_SECONDARY
        assert r.cigar.endswith("M")
        ln = int(r.cigar[:-1])
        assert ln == len(r.seq)
        # the reported substring occurs at the reported position
        gstart = int(al.seq_starts[al.seq_names.index(r.rname)]) + r.pos - 1
        np.testing.assert_array_equal(
            t[gstart:gstart + ln], encode_seq(r.seq),
            err_msg=f"{r.qname}@{r.rname}:{r.pos}")
        # rc lanes carry the REVERSED flag
    by = {}
    for r in recs:
        by.setdefault(r.qname, set()).add(bool(r.flag & SAM_REVERSED))
    for i in range(6):
        # exact reads: the matching orientation must appear
        assert (i % 2 == 1) in by[f"m{i}"]


def test_csv_rows(rng):
    idx, al = make_aligner(rng)
    t = idx.text
    reads = []
    for i in range(5):
        s = int(rng.integers(0, idx.n - 70))
        codes = t[s:s + 60].astype(np.int8).copy()
        codes[codes == 0] = 1
        reads.append((f"c{i}", decode_seq(codes), "I" * 60))
    rows = al.csv_rows_batch(reads)
    assert len(rows) == 5
    buf = io.StringIO()
    csv_header(buf)
    for row in rows:
        assert row.num_uniq_mems >= 1
        assert row.total_mem_occ >= row.num_uniq_mems  # >=1 occ per MEM
        assert 0.0 < row.max_mem_freq <= 1.0
        assert 0.0 <= row.min_mem_freq <= row.max_mem_freq
        assert row.high_occ_mem >= row.low_occ_mem >= 1
        write_csv(buf, row)
    lines = buf.getvalue().strip().split("\n")
    assert len(lines) == 6
    assert lines[0].startswith("read_name,")
    assert all(len(l.split(",")) == 9 for l in lines)


def test_csv_junk_read_empty(rng):
    _, al = make_aligner(rng)
    reads = [("junk", decode_seq(rng.integers(1, 5, 60).astype(np.int8)),
              "I" * 60)]
    rows = al.csv_rows_batch(reads)
    assert rows[0].num_uniq_mems == 0
    assert rows[0].total_mem_occ == 0
