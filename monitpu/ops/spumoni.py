"""SPUMONI pseudo-matching-statistics on TPU.

Reference: include/ms/spumoni.hpp:355-410 (`ms_pointers<..>::_query`
lengths-only specialization built by src/spumoni/build_spumoni.cpp and
run by src/spumoni/run_spumoni.cpp): the same threshold-directed
backward search as the full MS index, but the index carries NO suffix
array samples and NO Phi structures — only the RLBWT runs and
thresholds — and the per-position output is a pseudo-length that grows
by one on every matching backward step and resets to zero on every
threshold jump (spumoni.hpp:375-405). Pseudo-MS lengths lower-bound the
true MS lengths and are what SPUMONI-style read classification consumes.

TPU shape: identical to ops/ms.ms_pointers_batch — one lax.scan over
pattern positions carrying (pos, length) for the whole batch, each step
two row gathers (run2 8B, rc4 16B) plus the pos->run block lookup. The
threshold-only index is the lf_core_tables subset (ops/ms.py), ~40% of
the full index bytes, mirroring the reference's slimmer
`.thrbv.spumoni` serialization (spumoni.hpp:264-267).
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from .ms import SIGMA, _run_of_position, lf_core_tables


def pms_step(tables, pos, length, c):
    """One pseudo-MS backward step for a batch: (new_pos, new_length).

    Branchless blend of the reference's three cases (spumoni.hpp:369-405):
    absent char -> length 0; BWT[pos] == c -> length+1, LF step; else
    threshold jump (up/down picked by thresholds.rank) -> length 0."""
    F = tables["F32"]
    count_c = F[c + 1] - F[c]
    j = _run_of_position(tables, pos)
    run2 = tables["run2"][j]
    rs = run2[..., 0]
    head = run2[..., 1]
    rc4 = tables["rc4"][j * SIGMA + c]
    clen = rc4[..., 0]
    rank_runs = rc4[..., 1]
    match = head == c
    rank_c_pos = clen + jnp.where(match, pos - rs, 0)
    thr_c = rc4[..., 2] + (rc4[..., 3] <= pos).astype(jnp.int32)
    jump_up = (~match) & (rank_runs > thr_c)

    n = tables["n"]
    count0 = count_c == 0
    new_pos = jnp.where(
        count0, jnp.minimum(F[c], n - 1),
        F[c] + rank_c_pos - jump_up.astype(jnp.int32))
    new_len = jnp.where(count0 | ~match, 0, length + 1)
    return new_pos, new_len


@jax.jit
def pseudo_ms_batch(tables, reads, read_lens):
    """Pseudo-MS lengths for a padded batch.

    reads: int32[B, M] codes, read_lens: int32[B];
    returns lengths int32[B, M] (0 outside the read)."""
    B, M = reads.shape
    n = tables["n"]
    pos0 = jnp.full((B,), n - 1, dtype=jnp.int32)
    len0 = jnp.zeros((B,), dtype=jnp.int32)

    def step(carry, xs):
        pos, length = carry
        c, i = xs
        new_pos, new_len = pms_step(tables, pos, length, c)
        valid = i < read_lens
        pos = jnp.where(valid, new_pos, pos)
        length = jnp.where(valid, new_len, length)
        return (pos, length), jnp.where(valid, new_len, 0)

    idxs = jnp.arange(M - 1, -1, -1, dtype=jnp.int32)
    (_, _), len_rev = jax.lax.scan(
        step, (pos0, len0), (reads.T[::-1], idxs))
    return len_rev[::-1].T  # [B, M]


# ----------------------------------------------------------------------
# Threshold-only index serialization (build_spumoni / run_spumoni pair)
# ----------------------------------------------------------------------

_SPUMONI_FIELDS = ("F", "run_starts", "run_heads", "block_run",
                   "clen_at_run", "run_crank", "thr_cnt_run",
                   "thr_pos_run")


def save_spumoni(index, prefix: str) -> None:
    """Serialize the threshold-only subset of a MoniIndex to
    <prefix>.spumoni.npz (the reference's .thrbv.spumoni equivalent,
    built by src/spumoni/build_spumoni.cpp)."""
    p = pathlib.Path(prefix)
    arrays = {k: getattr(index, k) for k in _SPUMONI_FIELDS}
    np.savez_compressed(str(p) + ".spumoni.npz", **arrays)
    meta = {"n": int(index.n), "r": int(index.r), "version": 1}
    (p.parent / (p.name + ".spumoni.json")).write_text(json.dumps(meta))


def load_spumoni_tables(prefix: str):
    """Load a .spumoni.npz into the device table dict pseudo_ms_batch
    consumes. Also accepts a full index prefix transparently (callers
    use MoniIndex.load + prepare_spumoni_tables for that path)."""
    p = pathlib.Path(prefix)
    data = np.load(str(p) + ".spumoni.npz")
    meta = json.loads((p.parent / (p.name + ".spumoni.json")).read_text())

    class _Slim:
        pass

    s = _Slim()
    for k in _SPUMONI_FIELDS:
        setattr(s, k, data[k])
    s.n, s.r = meta["n"], meta["r"]
    return prepare_spumoni_tables(s)


def prepare_spumoni_tables(index):
    """Index (full or slim) -> minimal device tables for pseudo_ms_batch."""
    return lf_core_tables(index)
