"""monitpu — a TPU-native pangenome read aligner.

A from-scratch reimplementation of the capabilities of MONI-Align
(reference: maxrossi91/moni-align) designed for TPU hardware:

- The r-index (run-length BWT + thresholds + SA samples + sampled LCP)
  becomes a set of flat, device-resident arrays engineered for O(1)
  gather-based rank/select (see monitpu.index.schema).
- Matching-statistics backward search runs as a batched JAX scan of
  gathers, vmapped over thousands of reads (monitpu.ops.ms).
- MEM occurrence enumeration uses Phi/Phi^-1 successor-anchor tables
  with O(1) LCP (monitpu.ops.occs).
- Chaining is a vectorized minimap2-style DP (monitpu.ops.chain).
- Seed extension is a banded affine-gap Smith-Waterman wavefront kernel
  (monitpu.ops.sw), replacing ksw2.
- The grammar-compressed SLP random access of the reference is replaced
  by the plain packed text in HBM (random access = gather).

Layout mirrors SURVEY.md's layer map: index/ (L1-L2), ops/ (L3 kernels),
align/ (L3-L4 orchestration), io/ (L4), parallel/ (multi-chip), cli (L6).
"""

__version__ = "0.1.0"
