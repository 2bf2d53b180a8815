"""Offline index construction (host-side).

Replaces the reference's PFP -> pfp_thresholds -> bigrepair -> SlpEncBuild
subprocess pipeline (reference pipeline/moni.in:419-491) with a direct
suffix-array construction: SA via native SA-IS (monitpu/native) with a
NumPy prefix-doubling fallback, LCP via Kasai, then all run tables,
thresholds, SA samples and Phi anchors derived vectorized in NumPy.

The reference needs PFP because it targets texts far beyond RAM on small
machines; on a TPU host (100s of GB RAM) direct construction is simpler,
exact, and fast enough for chromosome-scale pangenomes. The output schema
is MoniIndex (see schema.py).

Threshold semantics (reference thirdparty/pfp-thresholds, consumed at
include/ms/moni.hpp:598-617): for consecutive runs of char c ending at row
e and next starting at row s, the threshold is the first row t in (e, s]
minimizing LCP[t]; backward search jumps up iff pos < t, expressed at query
time as rank comparisons (see ops/ms.py).
"""

from __future__ import annotations

import numpy as np

from .alphabet import SIGMA, SEP, encode_seq
from .schema import MoniIndex, BLOCK_BITS, PAD_POS


# ----------------------------------------------------------------------
# Suffix array
# ----------------------------------------------------------------------

def suffix_array(t: np.ndarray) -> np.ndarray:
    """Suffix array of int8/int array t. Native SA-IS if available,
    else O(n log^2 n) NumPy prefix doubling."""
    try:
        from ..native import sais  # noqa: PLC0415
        return sais.suffix_array(t)
    except Exception:
        return _suffix_array_doubling(t)


def _suffix_array_doubling(t: np.ndarray) -> np.ndarray:
    t = np.asarray(t, dtype=np.int64)
    n = t.size
    rank = np.unique(t, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        key_r = rank[sa]
        key_s = second[sa]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (np.diff(key_r) != 0) | (np.diff(key_s) != 0)
        newrank = np.empty(n, dtype=np.int64)
        newrank[sa] = np.cumsum(changed)
        rank = newrank
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int32)
        k *= 2


def bwt_from_sa(t: np.ndarray, sa: np.ndarray) -> np.ndarray:
    n = t.shape[0]
    idx = sa.astype(np.int64) - 1
    idx[idx < 0] = n - 1
    return t[idx]


def lcp_kasai(t: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP[i] = lce(T[SA[i-1]..], T[SA[i]..]); LCP[0] = 0."""
    try:
        from ..native import sais  # noqa: PLC0415
        return sais.lcp_array(t, sa)
    except Exception:
        pass
    n = t.shape[0]
    sa64 = sa.astype(np.int64)
    isa = np.empty(n, dtype=np.int64)
    isa[sa64] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int32)
    h = 0
    for i in range(n):
        ri = isa[i]
        if ri > 0:
            j = sa64[ri - 1]
            while i + h < n and j + h < n and t[i + h] == t[j + h]:
                h += 1
            lcp[ri] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def _seg_first_argmin(lcp64: np.ndarray, lo: np.ndarray,
                      hi: np.ndarray) -> np.ndarray:
    """First argmin row of lcp64 within each segment [lo_k, hi_k).

    Native zero-allocation loop when libmonitpu is available; NumPy
    composite-key fallback otherwise (fallback builds are small-text
    only — the same environments that fall back from native SA-IS)."""
    out = np.empty(lo.size, dtype=np.int64)
    lo = np.ascontiguousarray(lo, np.int64)
    hi = np.ascontiguousarray(hi, np.int64)
    try:
        import ctypes  # noqa: PLC0415
        from ..native.sais import _load  # noqa: PLC0415
        lib = _load()
        lib.monitpu_seg_first_argmin_64.restype = ctypes.c_int
        rc = lib.monitpu_seg_first_argmin_64(
            ctypes.c_void_p(lcp64.ctypes.data), ctypes.c_int64(lcp64.size),
            ctypes.c_void_p(lo.ctypes.data), ctypes.c_void_p(hi.ctypes.data),
            ctypes.c_int64(lo.size), ctypes.c_void_p(out.ctypes.data))
        if rc != 0:
            raise ValueError("bad segment bounds")
        return out
    except Exception:
        n = lcp64.size
        assert n < 3_000_000_000, "numpy fallback needs n^2 < 2^63"
        comp = lcp64 * np.int64(n) + np.arange(n, dtype=np.int64)
        comp_ext = np.concatenate([comp, [np.iinfo(np.int64).max]])
        bounds = np.empty(2 * lo.size, dtype=np.int64)
        bounds[0::2], bounds[1::2] = lo, hi
        return np.minimum.reduceat(comp_ext, bounds)[0::2] % n


# ----------------------------------------------------------------------
# Full index build
# ----------------------------------------------------------------------

def build_index(seqs, names=None, already_encoded: bool = False,
                force_wide: bool = False, consume: bool = False) -> MoniIndex:
    """Build a MoniIndex from a list of sequences (bytes/str or code arrays).

    Each sequence is terminated with SEP; the final SEP doubles as the
    text terminator (smallest char, so suffix order is well defined).

    consume=True releases each input sequence as soon as it has been
    copied into the concatenated text (the caller's list is emptied in
    place) — at pangenome scale the inputs are tens of GB that must
    not stay alive through the SA/LCP phase."""
    if names is None:
        names = [f"seq{i}" for i in range(len(seqs))]
    parts, starts = [], [0]
    for i in range(len(seqs)):
        s = seqs[i]
        codes = np.asarray(s, dtype=np.int8) if already_encoded else encode_seq(s)
        parts.append(codes)
        parts.append(np.array([SEP], dtype=np.int8))
        starts.append(starts[-1] + codes.size + 1)
    n_total = starts[-1]
    # assemble without np.concatenate's all-parts-plus-result peak,
    # releasing inputs as they are copied when consume is on
    text = np.empty(n_total, np.int8)
    off = 0
    for i in range(0, len(parts), 2):
        c = parts[i]
        text[off:off + c.size] = c
        text[off + c.size] = SEP
        off += c.size + 1
        parts[i] = None
        if consume:
            seqs[i // 2] = None
    if consume:
        seqs.clear()
    del parts
    n = text.size
    # n >= 2^31: int64 tables throughout (SA-IS/Kasai switch too) — the
    # reference swaps to 64-bit pfp_thresholds binaries at the same
    # boundary (/root/reference/pipeline/moni.in:195-204). No composite
    # key is involved anywhere (thresholds use a native segmented
    # argmin), so the build is bounded by RAM only.
    sa = suffix_array(text)
    return build_index_from_sa(text, sa, np.asarray(starts, dtype=np.int64),
                               list(names), force_wide=force_wide)


def build_index_from_sa(text, sa, seq_starts, seq_names,
                        force_wide=False) -> MoniIndex:
    n = text.size
    # force_wide exercises the 64-bit table path on small inputs (tests)
    idt = np.int64 if (force_wide or n > 2**31 - 2) else np.int32
    # copy=False: at pangenome scale each same-dtype astype copy is
    # 8n bytes of avoidable peak RSS (the 2.55 Gbp build OOM'd a
    # 125 GB box through exactly these)
    sa = sa.astype(idt, copy=False)
    sa64 = sa.astype(np.int64, copy=False)
    bwt = bwt_from_sa(text, sa)
    lcp = lcp_kasai(text, sa).astype(idt, copy=False)
    isa = np.empty(n, dtype=np.int64)
    isa[sa64] = np.arange(n)

    # F: cumulative counts
    counts = np.bincount(text.astype(np.int64), minlength=SIGMA)
    F = np.zeros(SIGMA + 1, dtype=np.int64)
    F[1:] = np.cumsum(counts)

    # runs
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = bwt[1:] != bwt[:-1]
    run_starts = np.flatnonzero(boundary).astype(idt, copy=False)
    del boundary
    r = run_starts.size
    run_heads = bwt[run_starts].astype(np.int8)
    del bwt   # counts already taken; frees n bytes before the r-tables
    run_ends = np.empty(r, dtype=np.int64)
    run_ends[:-1] = run_starts[1:].astype(np.int64) - 1
    run_ends[-1] = n - 1
    run_lens = run_ends - run_starts + 1

    samples_start = sa[run_starts].astype(idt)
    samples_last = sa[run_ends].astype(idt)

    # block-sampled run_of_position
    nblocks = (n >> BLOCK_BITS) + 1
    block_pos = np.arange(nblocks, dtype=np.int64) << BLOCK_BITS
    block_run = (np.searchsorted(run_starts, block_pos, side="right") - 1
                 ).astype(idt)
    block_run = np.concatenate([block_run, np.array([r - 1], dtype=idt)])

    # per-(run, char) tables
    heads64 = run_heads.astype(np.int64)
    onehot = np.zeros((r, SIGMA), dtype=np.int64)
    onehot[np.arange(r), heads64] = 1
    run_crank = np.cumsum(onehot, axis=0) - onehot          # c-runs before j
    wlen = onehot * run_lens[:, None]
    clen = np.cumsum(wlen, axis=0) - wlen
    nruns_c = onehot.sum(axis=0).astype(np.int32)
    del wlen, onehot

    # per-char c-run id lists and fused sample tables
    rc_max = max(int(nruns_c.max()), 1)
    csamples_start = np.zeros((SIGMA, rc_max), dtype=idt)
    csamples_last = np.zeros((SIGMA, rc_max), dtype=idt)
    cruns = []  # per-char run ids, used for thresholds below
    for c in range(SIGMA):
        ids = np.flatnonzero(heads64 == c)
        cruns.append(ids)
        csamples_start[c, : ids.size] = samples_start[ids]
        csamples_last[c, : ids.size] = samples_last[ids]

    # thresholds: per char, first argmin of LCP in (end_k, start_{k+1}]
    # via a native segmented argmin (O(covered rows), no temporaries,
    # no overflow — the former lcp*n+i composite key needed n^2 < 2^63
    # and materialized two n-sized int64 arrays)
    lcp64 = lcp.astype(np.int64, copy=False)
    thr_cnt_run = np.zeros((r, SIGMA), dtype=idt)
    # "no threshold" sentinel: larger than any position in this dtype
    thr_pos_run = np.full((r, SIGMA), np.iinfo(idt).max - 1, dtype=idt)
    rs64 = run_starts.astype(np.int64)
    for c in range(SIGMA):
        ids = cruns[c]
        if ids.size < 2:
            continue
        lo = run_ends[ids[:-1]] + 1                     # first row in (e, s]
        hi = rs64[ids[1:]] + 1                          # exclusive end
        pos_c = _seg_first_argmin(lcp64, lo, hi)        # sorted
        thr_cnt_run[:, c] = np.searchsorted(pos_c, rs64, side="left")
        # the (unique) c-threshold inside run j, if any: thresholds of char c
        # are separated by a c-run, so each run owns at most one.
        owner = np.searchsorted(rs64, pos_c, side="right") - 1
        thr_pos_run[owner, c] = pos_c.astype(idt)

    # Phi / Phi^-1 / PLCP successor anchors
    phi_z, phi_w, phi_wl = _phi_anchors(sa64, isa, lcp64, run_starts, n,
                                        from_starts=True, idt=idt)
    phiinv_z, phiinv_w, phiinv_wl = _phi_anchors(sa64, isa, lcp64, run_ends, n,
                                                 from_starts=False, idt=idt)

    return MoniIndex(
        text=text, seq_starts=seq_starts, seq_names=seq_names,
        F=F, run_starts=run_starts, run_heads=run_heads,
        samples_start=samples_start, samples_last=samples_last,
        block_run=block_run,
        clen_at_run=clen.astype(idt), run_crank=run_crank.astype(idt),
        thr_cnt_run=thr_cnt_run, thr_pos_run=thr_pos_run,
        csamples_start=csamples_start, csamples_last=csamples_last,
        nruns_c=nruns_c,
        phi_z=phi_z, phi_w=phi_w, phi_wl=phi_wl,
        phiinv_z=phiinv_z, phiinv_w=phiinv_w, phiinv_wl=phiinv_wl,
        n=n, r=r, sa0=int(sa[0]), sa_last=int(sa[n - 1]),
    )


def _phi_anchors(sa64, isa, lcp64, rows, n, from_starts, idt=np.int32):
    """Anchor arrays for Phi (run starts) or Phi^-1 (run ends).

    Anchors live at text positions Z = {(SA[row]-1) mod n}. At each anchor z:
      Phi(z)      = SA[isa[z]-1],  PLCP(z) = LCP[isa[z]]        (run starts)
      Phi^-1(z)   = SA[isa[z]+1],  lcp(z,.) = LCP[isa[z]+1]     (run ends)
    Between anchors both maps are linear with slope 1 (values) / -1 (lcp
    as q increases toward its successor anchor); see schema.py docstring."""
    z = (sa64[rows] - 1) % n
    # always include n-1 so every query has a successor anchor
    z = np.concatenate([z, [n - 1]])
    # Extra breakpoint around the suffix-0 row j0 = isa[0]: the linear
    # rule Phi^-1(q-1) = Phi^-1(q) - 1 needs SA[isa[q]+1] > 0 (and
    # symmetrically Phi needs SA[isa[q]-1] > 0) — it fails on the piece
    # whose neighbor row holds suffix 0, which is NOT a run boundary in
    # general. Anchor the top of the piece below that break:
    #   Phi:      break at q = SA[j0+1]  -> anchor z = SA[j0+1] - 1
    #   Phi^-1:   break at q = SA[j0-1]  -> anchor z = SA[j0-1] - 1
    # (Found the hard way: a 4-haplotype index walked occurrences into
    # occ - n garbage whenever a seed's Phi walk crossed this piece.)
    j0 = int(isa[0])
    if from_starts:
        if j0 + 1 < n:
            z = np.concatenate([z, [sa64[j0 + 1] - 1]])
    else:
        if j0 > 0:
            z = np.concatenate([z, [sa64[j0 - 1] - 1]])
    z = np.unique(z)  # sorted
    i = isa[z]
    if from_starts:
        prev = np.where(i > 0, i - 1, 0)
        w = sa64[prev]            # garbage at i==0, masked by callers (q==sa0)
        wl = lcp64[i]
    else:
        nxt = np.where(i < n - 1, i + 1, n - 1)
        w = sa64[nxt]
        wl = np.where(i < n - 1, lcp64[np.minimum(i + 1, n - 1)], 0)
    return (z.astype(idt), w.astype(idt), wl.astype(idt))
