"""Index construction + NumPy reference query tests against brute force.

Mirrors the reference's test strategy of validating index structures via
independent oracles (SURVEY.md §4): suffix array vs sorted suffixes, MS
vs O(n m^2) brute force, Phi vs explicit SA neighbors, occurrences vs
naive substring scan."""

import numpy as np
import pytest

from monitpu.index import build_index, suffix_array, encode_seq
from monitpu.index.build import _suffix_array_doubling, bwt_from_sa, lcp_kasai
from monitpu.index import refimpl


def random_text(rng, n, sigma=4, repetitive=False):
    if repetitive:
        base = rng.integers(1, 1 + sigma, size=max(n // 8, 4), dtype=np.int8)
        reps = []
        total = 0
        while total < n:
            s = base.copy()
            # sprinkle mutations
            k = max(1, s.size // 20)
            idxs = rng.integers(0, s.size, size=k)
            s[idxs] = rng.integers(1, 1 + sigma, size=k)
            reps.append(s)
            total += s.size
        return np.concatenate(reps)[:n]
    return rng.integers(1, 1 + sigma, size=n, dtype=np.int8)


def brute_sa(t):
    n = len(t)
    return np.array(sorted(range(n), key=lambda i: tuple(t[i:])), dtype=np.int32)


@pytest.mark.parametrize("n,repetitive", [(50, False), (200, True), (500, False)])
def test_suffix_array_small(rng, n, repetitive):
    t = random_text(rng, n, repetitive=repetitive)
    t = np.concatenate([t, np.array([0], dtype=np.int8)])
    sa = _suffix_array_doubling(t)
    np.testing.assert_array_equal(sa, brute_sa(t))


def test_lcp_kasai(rng):
    t = np.concatenate([random_text(rng, 300, repetitive=True),
                        np.array([0], dtype=np.int8)])
    sa = _suffix_array_doubling(t)
    lcp = lcp_kasai(t, sa)
    for i in range(1, len(t)):
        a, b = t[sa[i - 1]:], t[sa[i]:]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        assert lcp[i] == l
    assert lcp[0] == 0


def make_index(rng, n=300, nseqs=2, repetitive=True):
    seqs = [random_text(rng, n // nseqs, repetitive=repetitive)
            for _ in range(nseqs)]
    return build_index(seqs, already_encoded=True), seqs


def test_index_basic_invariants(rng):
    idx, _ = make_index(rng)
    n = idx.n
    assert idx.text[-1] == 0
    assert idx.F[-1] == n
    # runs partition [0, n)
    assert idx.run_starts[0] == 0
    assert np.all(np.diff(idx.run_starts) > 0)
    # per-run tables consistent
    sa = suffix_array(idx.text)
    bwt = bwt_from_sa(idx.text, sa)
    for j in range(idx.r):
        s = idx.run_starts[j]
        assert bwt[s] == idx.run_heads[j]
        if j > 0:
            assert bwt[s - 1] != bwt[s]
        for c in range(6):
            assert idx.clen_at_run[j, c] == np.sum(bwt[:s] == c)


def test_phi_phiinv_all_positions(rng):
    idx, _ = make_index(rng, n=240)
    sa = suffix_array(idx.text).astype(np.int64)
    n = idx.n
    isa = np.empty(n, dtype=np.int64)
    isa[sa] = np.arange(n)
    lcp = lcp_kasai(idx.text, sa.astype(np.int32))
    for q in range(n):
        i = isa[q]
        if i > 0:
            p, l = refimpl.phi(idx, q)
            assert p == sa[i - 1], f"phi({q})"
            assert l == lcp[i], f"phi_lcp({q})"
        if i < n - 1:
            nx, l = refimpl.phi_inv(idx, q)
            assert nx == sa[i + 1], f"phi_inv({q})"
            assert l == lcp[i + 1], f"phi_inv_lcp({q})"


def test_phi_phiinv_all_positions_repetitive(rng):
    """Repetitive multi-haplotype text: long linear Phi pieces cross the
    suffix-0 neighbor rows, where the run-boundary anchor set alone is
    insufficient (the SA[isa[q]±1] == 0 breakpoints; see _phi_anchors).
    Random text (above) has r ~ n and never exposes this."""
    base = rng.integers(1, 5, size=900, dtype=np.int8)
    seqs = []
    for h in range(4):
        s = base.copy()
        p = rng.integers(0, s.size, size=6)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, names=[f"h{i}" for i in range(4)],
                      already_encoded=True)
    sa = suffix_array(idx.text).astype(np.int64)
    n = idx.n
    isa = np.empty(n, dtype=np.int64)
    isa[sa] = np.arange(n)
    lcp = lcp_kasai(idx.text, sa.astype(np.int32))
    for q in range(n):
        i = isa[q]
        if i > 0:
            p, l = refimpl.phi(idx, q)
            assert p == sa[i - 1], f"phi({q})"
            assert l == lcp[i], f"phi_lcp({q})"
        if i < n - 1:
            nx, l = refimpl.phi_inv(idx, q)
            assert nx == sa[i + 1], f"phi_inv({q})"
            assert l == lcp[i + 1], f"phi_inv_lcp({q})"


@pytest.mark.parametrize("sigma,m", [(4, 25), (2, 40)])
def test_ms_vs_brute(rng, sigma, m):
    for trial in range(8):
        idx, _ = make_index(rng, n=200 + 40 * trial, repetitive=(trial % 2 == 0))
        # patterns: random, and exact substrings with mutations
        pats = [random_text(rng, m, sigma=sigma)]
        t = idx.text
        s = int(rng.integers(0, idx.n - m - 1))
        sub = t[s:s + m].copy()
        sub[m // 2] = (sub[m // 2] % 4) + 1  # mutate middle
        sub[sub == 0] = 1
        pats.append(sub)
        for pat in pats:
            ptr = refimpl.ms_pointers(idx, pat)
            lens = refimpl.ms_lengths_from_pointers(idx, pat, ptr)
            bptr, blens = refimpl.brute_matching_statistics(t, pat)
            np.testing.assert_array_equal(lens, blens, err_msg=f"trial {trial}")
            # pointer must witness the claimed length
            for i in range(m):
                l = int(lens[i])
                if l > 0:
                    np.testing.assert_array_equal(
                        t[ptr[i]:ptr[i] + l], pat[i:i + l],
                        err_msg=f"trial {trial} ptr witness i={i}")


def test_mem_occurrences_vs_brute(rng):
    idx, _ = make_index(rng, n=300, repetitive=True)
    t = idx.text
    n = idx.n
    for trial in range(20):
        length = int(rng.integers(3, 12))
        pos = int(rng.integers(0, n - length))
        if np.any(t[pos:pos + length] == 0):
            continue
        occs = set(refimpl.mem_occurrences(idx, pos, length))
        expected = refimpl.brute_occurrences(t, pos, length)
        assert occs == expected, f"trial {trial} pos={pos} len={length}"


def test_index_save_load(rng, tmp_path):
    idx, _ = make_index(rng)
    idx.save(str(tmp_path / "test"))
    idx2 = idx.load(str(tmp_path / "test"))
    np.testing.assert_array_equal(idx.text, idx2.text)
    np.testing.assert_array_equal(idx.phi_z, idx2.phi_z)
    assert idx.n == idx2.n and idx.r == idx2.r and idx.sa0 == idx2.sa0
    pat = random_text(rng, 20)
    np.testing.assert_array_equal(refimpl.ms_pointers(idx, pat),
                                  refimpl.ms_pointers(idx2, pat))
