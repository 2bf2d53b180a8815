"""Memory-light streaming index construction (the round-5 build diet).

The direct builder (build.py) holds text + SA + LCP + ISA + BWT and the
[r, SIGMA] tables simultaneously — measured ~47 B/position of peak RSS
(119 GB for the 2.55 Gbp demonstration, BASELINE.md), making build-box
RAM the binding constraint the reference avoids via PFP's compressed
working space (/root/reference/pipeline/moni.in:115-152).

This module rebuilds the SAME MoniIndex npz with disk spills and
streamed passes so peak RSS is dominated by the SA-IS stage alone:

  1. SA-IS (native)            text n + internal copy n + SA 8n (~10 n)
  2. SA -> disk, freed         stream everything else from the file
  3. BWT                       one streamed pass, random text gathers
  4. Phi scatter + PLCP        ONE 8n array, overwritten in place by
                               the native text-order PLCP loop
                               (monitpu_plcp_u8) — replaces Kasai,
                               whose rank array was another 8n
  5. LCP -> disk               plcp[sa[i]] streamed out, 8n freed
  6. runs / samples / anchors  r-sized, SA/LCP gathered by streamed
                               sorted-row passes
  7. thresholds                streamed chunked segment-argmin with
                               cross-chunk (min, first-pos) merge
  8. every table written to the npz AS PRODUCED and freed (zipfile
     streaming — np.load reads it like any savez output)

Peak is therefore ~10 B/position (vs 47): a 2-haplotype human (~6.2
Gbp) builds in ~65 GB instead of ~300. Output equality with build.py
is pinned array-for-array by tests/test_stream_build.py.
"""

from __future__ import annotations

import json
import os
import pathlib
import zipfile

import numpy as np
import numpy.lib.format as npfmt

from .alphabet import SIGMA, SEP, encode_seq
from .schema import BLOCK_BITS

CHUNK = 1 << 25          # streamed entries per pass (256 MB of int64)
_POS_BITS = 26           # chunk-local position bits in the argmin key
assert CHUNK <= (1 << _POS_BITS)


class _NpzWriter:
    """Write arrays into an npz one at a time (np.load-compatible)."""

    def __init__(self, path):
        self.z = zipfile.ZipFile(path, "w", zipfile.ZIP_STORED,
                                 allowZip64=True)

    def put(self, name, arr):
        with self.z.open(name + ".npy", "w", force_zip64=True) as f:
            npfmt.write_array(f, np.ascontiguousarray(arr))

    def close(self):
        self.z.close()


def _stream_chunks(path, dtype, n):
    with open(path, "rb") as f:
        off = 0
        while off < n:
            m = min(CHUNK, n - off)
            buf = np.fromfile(f, dtype=dtype, count=m)
            yield off, buf
            off += m


def _stream_gather(path, dtype, n, rows_sorted):
    """file[rows_sorted] with bounded RSS (rows_sorted ascending)."""
    out = np.empty(rows_sorted.size, dtype)
    for off, buf in _stream_chunks(path, dtype, n):
        a = np.searchsorted(rows_sorted, off, "left")
        b = np.searchsorted(rows_sorted, off + buf.size, "left")
        if b > a:
            out[a:b] = buf[rows_sorted[a:b] - off]
    return out


def _stream_find(path, dtype, n, values_sorted):
    """For each v in values_sorted (distinct, all present): the row with
    file[row] == v, plus the neighboring values file[row-1] and
    file[row+1] (0 beyond the ends). One streamed pass."""
    V = values_sorted.size
    rows = np.full(V, -1, np.int64)
    wprev = np.zeros(V, np.int64)
    wnext = np.zeros(V, np.int64)
    prev_last = 0
    pend_slot = -1
    for off, buf in _stream_chunks(path, dtype, n):
        if pend_slot >= 0:
            wnext[pend_slot] = buf[0]
            pend_slot = -1
        k = np.searchsorted(values_sorted, buf)
        kk = np.minimum(k, V - 1)
        hit = (k < V) & (values_sorted[kk] == buf)
        idx = np.flatnonzero(hit)
        if idx.size:
            slots = kk[idx]
            rows[slots] = off + idx
            wprev[slots] = np.where(idx > 0, buf[np.maximum(idx - 1, 0)],
                                    prev_last)
            last_in = idx == buf.size - 1
            wnext[slots] = np.where(last_in, 0,
                                    buf[np.minimum(idx + 1, buf.size - 1)])
            if last_in.any():
                pend_slot = int(slots[last_in][0])
        prev_last = int(buf[-1])
    return rows, wprev, wnext


def _thresholds_streamed(lcp_path, n, lo, hi):
    """First-argmin row of LCP within each [lo_k, hi_k) (sorted,
    non-overlapping), streaming the LCP file chunkwise."""
    nseg = lo.size
    best = np.full(nseg, np.iinfo(np.int64).max, np.int64)
    pos = np.zeros(nseg, np.int64)
    for off, buf in _stream_chunks(lcp_path, np.int64, n):
        m = buf.size
        a = np.searchsorted(hi, off, "right")      # first seg with hi > off
        b = np.searchsorted(lo, off + m, "left")   # first seg with lo >= end
        if b <= a:
            continue
        s = np.maximum(lo[a:b] - off, 0)
        e = np.minimum(hi[a:b] - off, m)
        comp = (buf << np.int64(_POS_BITS)) | np.arange(m, dtype=np.int64)
        comp_ext = np.concatenate([comp, [np.iinfo(np.int64).max]])
        bounds = np.empty(2 * (b - a), np.int64)
        bounds[0::2], bounds[1::2] = s, e
        part = np.minimum.reduceat(comp_ext, bounds)[0::2]
        val = part >> _POS_BITS
        p = off + (part & ((1 << _POS_BITS) - 1))
        upd = val < best[a:b]        # earlier chunks win ties (first pos)
        best[a:b] = np.where(upd, val, best[a:b])
        pos[a:b] = np.where(upd, p, pos[a:b])
    return pos


def build_index_streaming(seqs, names=None, out_prefix=None,
                          already_encoded=False, force_wide=False,
                          tmpdir=None, log=lambda *a: None):
    """Build <out_prefix>.monitpu.npz/.json directly on disk with
    ~10 B/position peak RSS. Returns a stats dict (n, r, sa0, sa_last,
    table_bytes). Load the result with MoniIndex.load(out_prefix)."""
    assert out_prefix, "streaming build writes straight to disk"
    if names is None:
        names = [f"seq{i}" for i in range(len(seqs))]
    p = pathlib.Path(out_prefix)
    if p.parent:
        os.makedirs(p.parent, exist_ok=True)
    tmp = pathlib.Path(tmpdir) if tmpdir else p.parent
    sa_path = tmp / (p.name + ".sa.tmp")
    lcp_path = tmp / (p.name + ".lcp.tmp")
    w = _NpzWriter(str(p) + ".monitpu.npz")

    # ---- text assembly (consuming the inputs) ----
    starts = [0]
    for i in range(len(seqs)):
        codes = (np.asarray(seqs[i], np.int8) if already_encoded
                 else encode_seq(seqs[i]))
        starts.append(starts[-1] + codes.size + 1)
        seqs[i] = codes
    n = starts[-1]
    text = np.empty(n, np.int8)
    off = 0
    for i in range(len(seqs)):
        c = seqs[i]
        text[off:off + c.size] = c
        text[off + c.size] = SEP
        off += c.size + 1
        seqs[i] = None
    seqs.clear()
    idt = np.int64 if (force_wide or n > 2**31 - 2) else np.int32
    log(f"stream build: n={n} dtype={np.dtype(idt).name}")

    # ---- SA (native SA-IS) -> disk ----
    from ..native import sais
    sa = sais.suffix_array(text).astype(np.int64, copy=False)
    sa0_v, sa_last_v = int(sa[0]), int(sa[n - 1])
    sa.tofile(sa_path)
    del sa
    log("SA on disk")

    # ---- BWT (streamed) ----
    bwt = np.empty(n, np.int8)
    for off, buf in _stream_chunks(sa_path, np.int64, n):
        bwt[off:off + buf.size] = text[(buf - 1) % n]
    log("BWT done")

    # ---- Phi scatter + in-place PLCP + LCP -> disk ----
    phi = np.empty(n, np.int64)
    prev_last = -1
    for off, buf in _stream_chunks(sa_path, np.int64, n):
        if off == 0:
            phi[buf[0]] = -1
            phi[buf[1:]] = buf[:-1]
        else:
            phi[buf[0]] = prev_last
            phi[buf[1:]] = buf[:-1]
        prev_last = int(buf[-1])
    sais.plcp_inplace(text, phi)     # phi is now PLCP
    with open(lcp_path, "wb") as f:
        for off, buf in _stream_chunks(sa_path, np.int64, n):
            phi[buf].tofile(f)
    del phi
    log("LCP on disk")

    # ---- text + seqs into the npz (text stays for nothing else) ----
    w.put("text", text)
    counts = np.bincount(text.astype(np.int64), minlength=SIGMA)
    F = np.zeros(SIGMA + 1, np.int64)
    F[1:] = np.cumsum(counts)
    w.put("F", F)
    w.put("seq_starts", np.asarray(starts, np.int64))
    del text

    # ---- runs ----
    boundary = np.empty(n, bool)
    boundary[0] = True
    boundary[1:] = bwt[1:] != bwt[:-1]
    run_starts = np.flatnonzero(boundary).astype(np.int64)
    del boundary
    r = run_starts.size
    run_heads = bwt[run_starts].astype(np.int8)
    del bwt
    run_ends = np.empty(r, np.int64)
    run_ends[:-1] = run_starts[1:] - 1
    run_ends[-1] = n - 1
    run_lens = run_ends - run_starts + 1
    w.put("run_starts", run_starts.astype(idt, copy=False))
    w.put("run_heads", run_heads)
    log(f"runs: r={r} (n/r={n/r:.1f})")

    # ---- samples (streamed sorted-row gathers) ----
    samples_start = _stream_gather(sa_path, np.int64, n, run_starts)
    samples_last = _stream_gather(sa_path, np.int64, n, run_ends)
    w.put("samples_start", samples_start.astype(idt))
    w.put("samples_last", samples_last.astype(idt))

    # ---- block_run ----
    nblocks = (n >> BLOCK_BITS) + 1
    block_pos = np.arange(nblocks, dtype=np.int64) << BLOCK_BITS
    block_run = (np.searchsorted(run_starts, block_pos, "right") - 1
                 ).astype(idt)
    w.put("block_run",
          np.concatenate([block_run, np.array([r - 1], idt)]))
    del block_pos, block_run

    # ---- per-(run, char) rank tables, one at a time ----
    heads64 = run_heads.astype(np.int64)
    cruns = [np.flatnonzero(heads64 == c) for c in range(SIGMA)]
    nruns_c = np.array([ids.size for ids in cruns], np.int32)
    tbl = np.empty((r, SIGMA), idt)
    for c in range(SIGMA):
        m = heads64 == c
        cs = np.cumsum(m)
        tbl[:, c] = cs - m
    w.put("run_crank", tbl)
    for c in range(SIGMA):
        m = heads64 == c
        wl = np.where(m, run_lens, 0)
        cl = np.cumsum(wl)
        tbl[:, c] = cl - wl
    w.put("clen_at_run", tbl)
    del tbl
    log("rank tables done")

    # ---- per-char fused sample tables ----
    rc_max = max(int(nruns_c.max()), 1)
    cs_t = np.zeros((SIGMA, rc_max), idt)
    cl_t = np.zeros((SIGMA, rc_max), idt)
    for c in range(SIGMA):
        ids = cruns[c]
        cs_t[c, : ids.size] = samples_start[ids]
        cl_t[c, : ids.size] = samples_last[ids]
    w.put("csamples_start", cs_t)
    w.put("csamples_last", cl_t)
    w.put("nruns_c", nruns_c)
    del cs_t, cl_t

    # ---- thresholds (streamed segment argmin) ----
    thr_cnt = np.zeros((r, SIGMA), idt)
    thr_pos = np.full((r, SIGMA), np.iinfo(idt).max - 1, idt)
    for c in range(SIGMA):
        ids = cruns[c]
        if ids.size < 2:
            continue
        lo = run_ends[ids[:-1]] + 1
        hi = run_starts[ids[1:]] + 1
        pos_c = _thresholds_streamed(lcp_path, n, lo, hi)
        thr_cnt[:, c] = np.searchsorted(pos_c, run_starts, "left")
        owner = np.searchsorted(run_starts, pos_c, "right") - 1
        thr_pos[owner, c] = pos_c.astype(idt)
    w.put("thr_cnt_run", thr_cnt)
    w.put("thr_pos_run", thr_pos)
    del thr_cnt, thr_pos
    log("thresholds done")

    # ---- Phi / Phi^-1 successor anchors ----
    # Key identity: for anchor z = (SA[j] - 1) mod n, the row isa[z] is
    # the LF mapping of j — LF(j) = F[BWT[j]] + rank_{BWT[j]}(j) — which
    # at run boundaries is O(1) from the rank tables ALREADY built
    # (clen_at_run). No SA value-search passes at all (an earlier
    # streamed-find formulation paid ~28 random cache misses per SA
    # entry and dominated the 2.55 Gbp build); the only SA/LCP I/O left
    # is four sorted-row gathers plus one pass locating isa[0].
    heads_at = heads64
    clen_own = np.empty(r, np.int64)
    for c in range(SIGMA):
        m = heads_at == c
        # recompute clen rows (the [r, SIGMA] table was freed): # of c
        # chars before each run, for the run's OWN head char only
        wl_ = np.where(m, run_lens, 0)
        cl = np.cumsum(wl_) - wl_
        clen_own[m] = cl[m]
    F_at_head = F[heads_at]

    def lf_row(j):
        """LF of arbitrary BWT rows j (int64 array)."""
        rn = np.searchsorted(run_starts, j, side="right") - 1
        c = heads_at[rn]
        return F[c] + clen_own[rn] + (j - run_starts[rn])

    # j0 = isa[0]: the one row holding suffix 0, located by value with
    # one streamed pass (also yields SA[j0 +/- 1] for the extra anchors)
    j0_rows, w0_prev, w0_next = _stream_find(sa_path, np.int64, n,
                                             np.array([0], np.int64))
    j0 = int(j0_rows[0])

    for fname_z, fname_w, fname_wl, from_starts, sam, rows_j in (
            ("phi_z", "phi_w", "phi_wl", True, samples_start,
             run_starts),
            ("phiinv_z", "phiinv_w", "phiinv_wl", False, samples_last,
             run_ends)):
        z = (sam - 1) % n
        i = (F_at_head + clen_own +
             (0 if from_starts else run_lens - 1))    # LF(rows_j)
        extras_z, extras_i = [n - 1], [lf_row(np.array([j0]))[0]]
        extra = (int(w0_next[0]) - 1) if from_starts else \
            (int(w0_prev[0]) - 1)
        if 0 <= extra < n:
            je = j0 + 1 if from_starts else j0 - 1
            extras_z.append(extra)
            extras_i.append(lf_row(np.array([je]))[0])
        z = np.concatenate([z, np.asarray(extras_z, np.int64)])
        i = np.concatenate([i, np.asarray(extras_i, np.int64)])
        order = np.argsort(z, kind="stable")
        z, i = z[order], i[order]
        keep = np.empty(z.size, bool)
        keep[0] = True
        keep[1:] = z[1:] != z[:-1]     # i is a function of z: dups agree
        z, i = z[keep], i[keep]

        def gather_rows(path, rows):
            rows_c = np.clip(rows, 0, n - 1)
            o = np.argsort(rows_c, kind="stable")
            out = np.empty(rows.size, np.int64)
            out[o] = _stream_gather(path, np.int64, n, rows_c[o])
            return out
        if from_starts:
            wv = np.where(i > 0, gather_rows(sa_path, i - 1), sa0_v)
            wl_v = gather_rows(lcp_path, i)
        else:
            wv = np.where(i < n - 1, gather_rows(sa_path, i + 1),
                          sa_last_v)
            wl_v = np.where(i < n - 1, gather_rows(lcp_path, i + 1), 0)
        w.put(fname_z, z.astype(idt))
        w.put(fname_w, wv.astype(idt))
        w.put(fname_wl, wl_v.astype(idt))
        log(f"{fname_z} done ({z.size} anchors)")
    log("phi anchors done")

    w.close()
    meta = {"n": int(n), "r": int(r), "sa0": sa0_v, "sa_last": sa_last_v,
            "seq_names": list(names), "version": 1}
    (p.parent / (p.name + ".monitpu.json")).write_text(json.dumps(meta))
    os.remove(sa_path)
    os.remove(lcp_path)
    return {"n": int(n), "r": int(r), "sa0": sa0_v, "sa_last": sa_last_v}
