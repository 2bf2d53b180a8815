"""Utility tools (reference utils/*.cpp equivalents)."""

import numpy as np

from monitpu.utils.tools import (split_fa, extract_text, random_access,
                                 blast_like)
from monitpu.index.alphabet import decode_seq

from test_ms_kernel import build_small


def test_split_fa(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">s1 desc\nACGT\nACGT\n>s2\nTTTT\n")
    paths = split_fa(str(fa), str(tmp_path / "out"))
    assert len(paths) == 2
    assert open(paths[0]).read() == ">s1\nACGTACGT\n"
    assert open(paths[1]).read() == ">s2\nTTTT\n"


def test_extract_and_ra(rng):
    idx = build_small(rng)
    s = extract_text(idx, 10, 25)
    assert s == decode_seq(idx.text[10:35])
    assert random_access(idx, [10, 11, 12]) == s[:3]
    # clamped at the end
    assert len(extract_text(idx, idx.n - 5, 100)) == 5


def test_blast_like_render():
    out = blast_like("ACGTACG", "ACCTAG", "2M1X1M1D2M")
    t, bars, q = out.strip("\n").split("\n")
    assert t == "ACGTACG"
    assert q == "ACCT-AG"
    assert bars == "||*| *|"


def test_blast_like_softclip_insert():
    out = blast_like("ACGT", "TTACGGGT", "2S2M2I2M")
    t, bars, q = out.strip("\n").split("\n")
    assert t == "  AC  GT"
    assert q == "ttACGGGT"
    assert bars == "  ||  ||"
