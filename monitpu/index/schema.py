"""Query-time index schema: flat arrays engineered for TPU gathers.

This replaces the reference's succinct-structure stack (sdsl sd_vectors,
ri::rle_string run-aware rank/select, thr_bv per-char bitvectors,
predecessor structures for Phi — reference include/ms/moni.hpp:285-355,
include/ms/thresholds_ds.hpp:370-529, include/ms/ms_rle_string.hpp:135-167)
with a design where every hot query-time operation is either a single
gather or a short bounded binary search:

- ``run_of_position``: block-sampled run table (``block_run``) + <=6-step
  binary search inside the block, instead of sd_vector rank.
- ``run_and_head_rank(run, c)`` / char-rank: precomputed per-(run, char)
  tables ``run_crank`` and ``clen_at_run`` — one gather each, no rank
  structure at all.
- thresholds rank (thr_bv::rank, thresholds_ds.hpp:494): each BWT run
  contains at most one threshold per character (thresholds of char c are
  separated by a c-run), so ``thr_cnt_run[j,c] + (thr_pos_run[j,c] <= pos)``
  gives the exact rank with two gathers.
- ``run_head_select(k, c)`` + SA sample lookup fused: ``csamples_start`` /
  ``csamples_last`` give the SA sample of the k-th c-run directly.
- Phi / Phi^-1 / PLCP (moni.hpp:186-251 build_phi, moni_lcp.hpp:230-272):
  successor-anchor arrays. Derivation (ours, from the LF/run structure):
  with X = {SA[i] : i a BWT run start}, for any q the map q -> Phi(q)
  is linear with slope 1 on each maximal segment of positions whose
  successor anchor in Z = {x-1 : x in X} is the same, and likewise
  PLCP(q) = lcp(q, Phi(q)) is linear with slope -1 toward the anchor.
  So three arrays (sorted anchor, Phi at anchor, PLCP at anchor) answer
  Phi+LCP in one searchsorted + two gathers; same for Phi^-1 with run-end
  anchors. This subsumes both build_phi structures and the .slcp samples.
- The grammar-compressed SLP random access (thirdparty/ShapedSlp,
  charAt/expandSubstr/lceToRBounded) is replaced by the plain int8 text
  in HBM: random access is a gather, LCE is a vectorized compare.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

BLOCK_BITS = 6          # run_of_position block size = 64 positions
PAD_POS = np.int32(2**31 - 1)   # "no position" sentinel (> any pos)


@dataclasses.dataclass
class MoniIndex:
    # --- text / sequences ---
    text: np.ndarray          # int8[n] encoded text, ends with SEP
    seq_starts: np.ndarray    # int64[S+1] start offset of each sequence (+ total)
    seq_names: list           # S names (host only)

    # --- BWT run structure ---
    F: np.ndarray             # int64[SIGMA+1] cumulative char counts
    run_starts: np.ndarray    # int32[r] BWT position of each run start
    run_heads: np.ndarray     # int8[r]
    samples_start: np.ndarray # int32[r] SA at run start
    samples_last: np.ndarray  # int32[r] SA at run end
    block_run: np.ndarray     # int32[ceil(n/64)+1] run id containing pos b*64

    # --- per-(run, char) O(1) rank tables, shape [r, SIGMA] ---
    clen_at_run: np.ndarray   # int32: # of c chars in BWT[0:run_start[j])
    run_crank: np.ndarray     # int32: # of c-runs with id < j
    thr_cnt_run: np.ndarray   # int32: # of c-thresholds at pos < run_start[j]
    thr_pos_run: np.ndarray   # int32: pos of the c-threshold inside run j, or PAD

    # --- per-char run sample tables, shape [SIGMA, Rc_max] ---
    csamples_start: np.ndarray  # int32: SA sample at start of k-th c-run
    csamples_last: np.ndarray   # int32: SA sample at end of k-th c-run
    nruns_c: np.ndarray         # int32[SIGMA]

    # --- Phi / Phi^-1 / PLCP successor anchors ---
    phi_z: np.ndarray         # int32[rz] sorted anchors (run-start derived)
    phi_w: np.ndarray         # int32[rz] Phi at anchor
    phi_wl: np.ndarray        # int32[rz] PLCP at anchor
    phiinv_z: np.ndarray      # int32[re] sorted anchors (run-end derived)
    phiinv_w: np.ndarray      # int32[re] Phi^-1 at anchor
    phiinv_wl: np.ndarray     # int32[re] lcp(z, Phi^-1(z)) at anchor

    # --- scalars ---
    n: int
    r: int
    sa0: int                  # SA[0]  (top row; Phi undefined here)
    sa_last: int              # SA[n-1] (bottom row; Phi^-1 undefined; MS start sample)

    @property
    def num_seqs(self) -> int:
        return len(self.seq_names)

    # ------------------------------------------------------------------
    def save(self, prefix: str) -> None:
        """Serialize to <prefix>.monitpu.npz (+ .json sidecar for names).

        The index *is* the checkpoint, mirroring the reference's
        serialize/load on every structure (moni.hpp:360-409)."""
        p = pathlib.Path(prefix)
        arrays = {f.name: getattr(self, f.name)
                  for f in dataclasses.fields(self)
                  if isinstance(getattr(self, f.name), np.ndarray)}
        np.savez_compressed(str(p) + ".monitpu.npz", **arrays)
        meta = {"n": int(self.n), "r": int(self.r), "sa0": int(self.sa0),
                "sa_last": int(self.sa_last), "seq_names": list(self.seq_names),
                "version": 1}
        (p.parent / (p.name + ".monitpu.json")).write_text(json.dumps(meta))

    @classmethod
    def load(cls, prefix: str) -> "MoniIndex":
        p = pathlib.Path(prefix)
        data = np.load(str(p) + ".monitpu.npz")
        meta = json.loads((p.parent / (p.name + ".monitpu.json")).read_text())
        kw = {k: data[k] for k in data.files}
        return cls(seq_names=meta["seq_names"], n=meta["n"], r=meta["r"],
                   sa0=meta["sa0"], sa_last=meta["sa_last"], **kw)

    # ------------------------------------------------------------------
    def device_tables(self):
        """Return the pytree of device arrays consumed by the kernels."""
        import jax.numpy as jnp
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                d[f.name] = jnp.asarray(v)
        d["n"] = np.int32(self.n)
        d["r"] = np.int32(self.r)
        d["sa0"] = np.int32(self.sa0)
        d["sa_last"] = np.int32(self.sa_last)
        return d

    def nbytes(self) -> int:
        return sum(getattr(self, f.name).nbytes
                   for f in dataclasses.fields(self)
                   if isinstance(getattr(self, f.name), np.ndarray))
