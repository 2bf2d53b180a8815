"""Text alphabet for the TPU index.

The reference operates on raw bytes with a 0x00/0x01 terminator scheme
inherited from PFP (reference: include/common/common.hpp:64-65, pipeline
normalization `--acgt-only`). We use a dense 6-letter alphabet instead so
that every query-time table is small and every comparison is an int8 op:

    0 = SEP  sequence separator / terminator (sorts smallest)
    1 = A   2 = C   3 = G   4 = T   5 = N

Reads never contain SEP, so matches can never span sequence boundaries
(the reference needs seqidx::valid() for this, include/common/seqidx.hpp:164;
we get it for free and keep valid() only as a debug check).
"""

import numpy as np

SIGMA = 6
SEP, A, C, G, T, N = 0, 1, 2, 3, 4, 5

# byte -> code; unknown/ambiguous IUPAC letters map to N like the
# reference's nt4 table maps them to 'N' (include/aligner/aligner_ksw2.hpp:3266).
_ENC = np.full(256, N, dtype=np.int8)
for b, v in [(b"A", A), (b"C", C), (b"G", G), (b"T", T),
             (b"a", A), (b"c", C), (b"g", G), (b"t", T)]:
    _ENC[b[0]] = v
_ENC[0] = SEP

_DEC = np.frombuffer(b"$ACGTN", dtype=np.uint8).copy()

# complement in code space: A<->T, C<->G, N->N, SEP->SEP
_COMP = np.array([SEP, T, G, C, A, N], dtype=np.int8)


def encode_seq(s) -> np.ndarray:
    """bytes/str -> int8 code array."""
    if isinstance(s, str):
        s = s.encode()
    return _ENC[np.frombuffer(s, dtype=np.uint8)].copy()


def decode_seq(codes) -> str:
    return _DEC[np.asarray(codes, dtype=np.int64)].tobytes().decode()


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes][::-1].copy()


def encode_batch(seqs, M, dtype=np.int32):
    """Vectorized batch encode: list of str/bytes -> (fwd [B, M],
    rc [B, M], lens int32[B]), fwd/rc zero-padded, rc = per-row
    reverse complement. One C-speed join + one table lookup replaces
    the per-read Python encode loop (was ~10 us/read on the submit
    path)."""
    B = len(seqs)
    clipped = [s[:M] for s in seqs]
    lens = np.fromiter((len(s) for s in clipped), np.int32, B)
    blob = "\0".join(clipped).encode() if clipped and isinstance(
        clipped[0], str) else b"\0".join(clipped)
    flat = _ENC[np.frombuffer(blob, np.uint8)] if B else np.zeros(0, np.int8)
    offs = np.zeros(B, np.int64)
    if B > 1:
        offs[1:] = np.cumsum(lens[:-1].astype(np.int64) + 1)
    cols = np.arange(M)
    valid = cols[None, :] < lens[:, None]
    idx = offs[:, None] + cols[None, :]
    fwd = np.where(valid, flat[np.minimum(idx, max(flat.size - 1, 0))],
                   0).astype(dtype)
    ridx = np.clip(lens[:, None] - 1 - cols[None, :], 0, M - 1)
    rc = np.where(valid, _COMP[np.take_along_axis(fwd, ridx, axis=1)],
                  0).astype(dtype)
    return fwd, rc, lens
