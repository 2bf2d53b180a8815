"""SPUMONI pseudo-MS kernel vs NumPy reference (include/ms/spumoni.hpp
:355-410 semantics), plus slim-index round-trip."""

import numpy as np
import jax.numpy as jnp

from monitpu.index import build_index
from monitpu.index import refimpl
from monitpu.ops.ms import prepare_tables, ms_pointers_batch, ms_lengths_batch
from monitpu.ops.spumoni import (
    pseudo_ms_batch, prepare_spumoni_tables, save_spumoni,
    load_spumoni_tables)

from test_ms_kernel import build_small, make_batch


def test_pseudo_ms_parity(rng):
    idx = build_small(rng)
    tables = prepare_spumoni_tables(idx)
    reads, lens = make_batch(rng, idx, B=14, M=70)
    out = np.asarray(pseudo_ms_batch(tables, jnp.asarray(reads),
                                     jnp.asarray(lens)))
    for b in range(reads.shape[0]):
        L = lens[b]
        expect = refimpl.pseudo_ms_lengths(idx, reads[b, :L])
        np.testing.assert_array_equal(out[b, :L], expect, err_msg=f"read {b}")
        assert np.all(out[b, L:] == 0)


def test_pseudo_ms_lower_bounds_true_ms(rng):
    idx = build_small(rng)
    full = prepare_tables(idx)
    slim = prepare_spumoni_tables(idx)
    reads, lens = make_batch(rng, idx, B=10, M=60)
    pms = np.asarray(pseudo_ms_batch(slim, jnp.asarray(reads),
                                     jnp.asarray(lens)))
    ptr = ms_pointers_batch(full, jnp.asarray(reads), jnp.asarray(lens))
    ms = np.asarray(ms_lengths_batch(full, jnp.asarray(reads),
                                     jnp.asarray(lens), ptr,
                                     work_per_read=reads.shape[1]))
    assert np.all(pms <= ms)


def test_pseudo_ms_exact_substring(rng):
    """An exact substring read never jumps: pseudo-MS == true MS == the
    decreasing suffix lengths (when the full read occurs in the text)."""
    idx = build_small(rng)
    slim = prepare_spumoni_tables(idx)
    t = idx.text
    L, s = 36, 23
    read = t[s:s + L].astype(np.int32)
    assert np.all(read != 0)
    out = np.asarray(pseudo_ms_batch(slim, jnp.asarray(read[None, :]),
                                     jnp.asarray([L], np.int32)))[0]
    expect = refimpl.pseudo_ms_lengths(idx, read)
    np.testing.assert_array_equal(out, expect)
    assert out[0] == expect[0]
    # lengths never jump up by more than +1 going leftwards
    assert np.all(np.diff(out[::-1]) <= 1)


def test_spumoni_index_roundtrip(rng, tmp_path):
    idx = build_small(rng)
    prefix = str(tmp_path / "slim")
    save_spumoni(idx, prefix)
    tables = load_spumoni_tables(prefix)
    reads, lens = make_batch(rng, idx, B=6, M=50)
    a = np.asarray(pseudo_ms_batch(tables, jnp.asarray(reads),
                                   jnp.asarray(lens)))
    b = np.asarray(pseudo_ms_batch(prepare_spumoni_tables(idx),
                                   jnp.asarray(reads), jnp.asarray(lens)))
    np.testing.assert_array_equal(a, b)
