"""Host-side NumPy reference implementation of the query algorithms.

Semantically equivalent to the reference's specialized fast query
(include/ms/moni.hpp:567-624) and Phi/Phi^-1 with LCP
(include/aligner/moni_lcp.hpp:230-272), restated over the MoniIndex flat
tables. This is the oracle for the TPU kernels and the CPU baseline for
bench comparisons; it is also tested against brute force on tiny texts.

Pointer convention (ours): ptr[i] is a text position p such that
T[p..p+len_i) == P[i..i+len_i) where len_i is the matching statistic.
We track sample = SA[pos] exactly and record after the LF step; the
reference stores samples pre-decremented (r-index stores SA[i]-1) and
records mid-step — the emitted pointers are identical.
"""

from __future__ import annotations

import numpy as np

from .schema import MoniIndex


def run_of_position(idx: MoniIndex, pos: int) -> int:
    return int(np.searchsorted(idx.run_starts, pos, side="right") - 1)


def ms_pointers(idx: MoniIndex, pattern: np.ndarray) -> np.ndarray:
    """Matching-statistics pointers for an encoded pattern (right-to-left)."""
    m = len(pattern)
    ptr = np.zeros(m, dtype=np.int64)
    pos = idx.n - 1
    sample = idx.sa_last
    F = idx.F
    for i in range(m - 1, -1, -1):
        c = int(pattern[i])
        count_c = int(F[c + 1] - F[c])
        j = run_of_position(idx, pos)
        head = int(idx.run_heads[j])
        rank_c_pos = int(idx.clen_at_run[j, c])
        if head == c:
            rank_c_pos += pos - int(idx.run_starts[j])
        if count_c == 0:
            sample = 0
            pos = min(int(F[c]), idx.n - 1)  # clamp: F[c]==n when c > all text chars
        elif head == c:
            sample -= 1
            pos = int(F[c]) + rank_c_pos
        else:
            rank_runs = int(idx.run_crank[j, c])
            thr_c = int(idx.thr_cnt_run[j, c]) + int(idx.thr_pos_run[j, c] <= pos)
            if rank_runs > thr_c:   # jump up to end of previous c-run
                sample = int(idx.csamples_last[c, rank_runs - 1]) - 1
                pos = int(F[c]) + rank_c_pos - 1
            else:                   # jump down to start of next c-run
                sample = int(idx.csamples_start[c, rank_runs]) - 1
                pos = int(F[c]) + rank_c_pos
        ptr[i] = sample
    return ptr


def ms_lengths_from_pointers(idx: MoniIndex, pattern: np.ndarray,
                             ptr: np.ndarray) -> np.ndarray:
    """Recover MS lengths by LCE against the text, with the shifted-pointer
    skip of the reference (seed_finder.hpp:138-147)."""
    m = len(pattern)
    n = idx.n
    t = idx.text
    lens = np.zeros(m, dtype=np.int64)
    l = 0
    prev_pos_plus_one = n + 1
    for i in range(m):
        pos = int(ptr[i])
        if pos != prev_pos_plus_one:
            while i + l < m and pos + l < n and pattern[i + l] == t[pos + l]:
                l += 1
        lens[i] = l
        l = max(l - 1, 0)
        prev_pos_plus_one = pos + 1
    return lens


def pseudo_ms_lengths(idx: MoniIndex, pattern: np.ndarray) -> np.ndarray:
    """SPUMONI pseudo-matching-statistics lengths: the threshold-directed
    backward search of include/ms/spumoni.hpp:355-410 — length grows by 1
    on a matching step and resets to 0 on a threshold jump or absent
    char. Uses only the RLBWT/threshold tables (no SA samples, no Phi)."""
    m = len(pattern)
    lens = np.zeros(m, dtype=np.int64)
    pos = idx.n - 1
    length = 0
    F = idx.F
    for i in range(m - 1, -1, -1):
        c = int(pattern[i])
        count_c = int(F[c + 1] - F[c])
        j = run_of_position(idx, pos)
        head = int(idx.run_heads[j])
        rank_c_pos = int(idx.clen_at_run[j, c])
        if head == c:
            rank_c_pos += pos - int(idx.run_starts[j])
        if count_c == 0:
            length = 0
            pos = min(int(F[c]), idx.n - 1)
        elif head == c:
            length += 1
            pos = int(F[c]) + rank_c_pos
        else:
            rank_runs = int(idx.run_crank[j, c])
            thr_c = int(idx.thr_cnt_run[j, c]) + int(idx.thr_pos_run[j, c] <= pos)
            pos = int(F[c]) + rank_c_pos - (1 if rank_runs > thr_c else 0)
            length = 0
        lens[i] = length
    return lens


def phi(idx: MoniIndex, q: int):
    """(Phi(q), lcp(q, Phi(q))). Undefined at q == sa0 (top row)."""
    k = int(np.searchsorted(idx.phi_z, q, side="left"))
    z = int(idx.phi_z[k])
    return int(idx.phi_w[k]) - (z - q), int(idx.phi_wl[k]) + (z - q)


def phi_inv(idx: MoniIndex, q: int):
    """(Phi^-1(q), lcp(q, Phi^-1(q))). Undefined at q == sa_last."""
    k = int(np.searchsorted(idx.phiinv_z, q, side="left"))
    z = int(idx.phiinv_z[k])
    return int(idx.phiinv_w[k]) - (z - q), int(idx.phiinv_wl[k]) + (z - q)


def mem_occurrences(idx: MoniIndex, pos: int, length: int,
                    max_occs: int = 10**9) -> list:
    """All text occurrences of T[pos..pos+length) via Phi walks
    (reference find_MEM_above/below, seed_finder.hpp:169-239)."""
    occs = [pos]
    cur = pos
    while cur != idx.sa0:
        prev, lcp = phi(idx, cur)
        if lcp < length or len(occs) >= max_occs:
            break
        occs.append(prev)
        cur = prev
    cur = pos
    while cur != idx.sa_last:
        nxt, lcp = phi_inv(idx, cur)
        if lcp < length or len(occs) >= max_occs:
            break
        occs.append(nxt)
        cur = nxt
    return occs


# ----------------------------------------------------------------------
# Brute-force oracles (tiny texts only)
# ----------------------------------------------------------------------

def brute_matching_statistics(text: np.ndarray, pattern: np.ndarray):
    """O(n*m^2) matching statistics: for each i, the longest prefix of
    P[i..] occurring in text, and one position where it occurs."""
    n, m = len(text), len(pattern)
    lens = np.zeros(m, dtype=np.int64)
    ptrs = np.zeros(m, dtype=np.int64)
    for i in range(m):
        best, bpos = 0, 0
        for p in range(n):
            l = 0
            while i + l < m and p + l < n and pattern[i + l] == text[p + l]:
                l += 1
            if l > best:
                best, bpos = l, p
        lens[i] = best
        ptrs[i] = bpos
    return ptrs, lens


def brute_occurrences(text: np.ndarray, pos: int, length: int) -> set:
    sub = text[pos:pos + length]
    n = len(text)
    return {p for p in range(n - length + 1)
            if np.array_equal(text[p:p + length], sub)}
