"""TPU MS kernel vs NumPy reference implementation (itself brute-force
validated in test_index.py)."""

import numpy as np
import jax.numpy as jnp

from monitpu.index import build_index
from monitpu.index import refimpl
from monitpu.ops.ms import (
    ms_pointers_batch, ms_lengths_batch, find_mems_batch, prepare_tables)


def make_batch(rng, idx, B=12, M=60, mutate=True):
    """Reads sampled from the indexed text with mutations + some random."""
    reads = np.zeros((B, M), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    t = idx.text
    for b in range(B):
        L = int(rng.integers(M // 2, M + 1))
        if b % 4 == 3:
            r = rng.integers(1, 5, size=L)
        else:
            s = int(rng.integers(0, idx.n - L - 1))
            r = t[s:s + L].astype(np.int64).copy()
            r[r == 0] = 1
            if mutate:
                k = rng.integers(0, max(L // 10, 1) + 1)
                pos = rng.integers(0, L, size=k)
                r[pos] = rng.integers(1, 5, size=k)
        reads[b, :L] = r
        lens[b] = L
    return reads, lens


def build_small(rng, n=600):
    seqs = []
    base = rng.integers(1, 5, size=n // 3, dtype=np.int8)
    for _ in range(3):
        s = base.copy()
        k = max(1, s.size // 15)
        p = rng.integers(0, s.size, size=k)
        s[p] = rng.integers(1, 5, size=k)
        seqs.append(s)
    return build_index(seqs, already_encoded=True)


def test_ms_pointers_parity(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    reads, lens = make_batch(rng, idx)
    ptr = np.asarray(ms_pointers_batch(tables, jnp.asarray(reads),
                                       jnp.asarray(lens)))
    for b in range(reads.shape[0]):
        L = lens[b]
        expect = refimpl.ms_pointers(idx, reads[b, :L])
        np.testing.assert_array_equal(ptr[b, :L], expect, err_msg=f"read {b}")
        assert np.all(ptr[b, L:] == 0)


def test_ms_lengths_parity(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    reads, lens = make_batch(rng, idx)
    ptr = ms_pointers_batch(tables, jnp.asarray(reads), jnp.asarray(lens))
    out = np.asarray(ms_lengths_batch(tables, jnp.asarray(reads),
                                      jnp.asarray(lens), ptr,
                                      work_per_read=reads.shape[1]))
    for b in range(reads.shape[0]):
        L = lens[b]
        p = refimpl.ms_pointers(idx, reads[b, :L])
        expect = refimpl.ms_lengths_from_pointers(idx, reads[b, :L], p)
        np.testing.assert_array_equal(out[b, :L], expect, err_msg=f"read {b}")


def ref_find_mems(idx, read, min_len):
    """Host transliteration of seed_finder::find_mems emission rules."""
    ptr = refimpl.ms_pointers(idx, read)
    lens = refimpl.ms_lengths_from_pointers(idx, read, ptr)
    mems = []
    pl = 0
    for i in range(len(read)):
        l = int(lens[i])
        all_n = np.all(read[i:i + l] == 5) if l > 0 else True
        if l >= pl and l >= min_len and not all_n:
            mems.append((int(ptr[i]), l, i))
        pl = l
    return mems


def test_find_mems_parity(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    reads, lens = make_batch(rng, idx, B=16, M=80)
    min_len = 10
    mp, ml, mi, mc, _ = find_mems_batch(tables, jnp.asarray(reads),
                                     jnp.asarray(lens),
                                     max_mems=16, min_len=min_len,
                                     work_per_read=reads.shape[1])
    mp, ml, mi, mc = map(np.asarray, (mp, ml, mi, mc))
    for b in range(reads.shape[0]):
        expect = ref_find_mems(idx, reads[b, :lens[b]], min_len)[:16]
        got = [(int(mp[b, k]), int(ml[b, k]), int(mi[b, k]))
               for k in range(mc[b])]
        assert got == expect, f"read {b}: {got} != {expect}"


def test_find_mems_exact_read_has_full_mem(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    t = idx.text
    L = 40
    s = 17
    read = t[s:s + L].astype(np.int32)
    assert np.all(read != 0)
    reads = read[None, :]
    mp, ml, mi, mc, _ = find_mems_batch(
        tables, jnp.asarray(reads), jnp.asarray([L], dtype=np.int32),
        max_mems=8, min_len=20)
    assert int(mc[0]) >= 1
    assert int(ml[0, 0]) == L
    got = int(mp[0, 0])
    np.testing.assert_array_equal(t[got:got + L], read)


def test_compact_layout_parity(rng):
    """ms_step's compact layout (block+delta pos->run, run2/rc4 rows,
    fused csam2 sample pairs — 1.07 B/pos + 128 B/run) must reproduce
    the fused layout bit-for-bit across pointers, lengths and MEMs."""
    from monitpu.ops.ms import (prepare_tables_host, stage_tables,
                                find_mems_batch)
    idx = build_small(rng, n=4000)
    reads, lens = make_batch(rng, idx, B=24, M=80)
    fused = stage_tables(prepare_tables_host(idx))
    compact = stage_tables(prepare_tables_host(idx, layout="compact"))
    assert "lf8" not in compact and "csam2" in compact
    a = find_mems_batch(fused, reads, lens)
    b = find_mems_batch(compact, reads, lens)
    for x, y in zip(a[:4], b[:4]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
