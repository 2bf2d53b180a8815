"""Phi-walk occurrence kernels vs brute force + NumPy reference."""

import numpy as np
import jax.numpy as jnp

from monitpu.index import build_index
from monitpu.index import refimpl
from monitpu.ops.ms import find_mems_batch, prepare_tables
from monitpu.ops.occs import (phi_batch, phi_inv_batch, enumerate_occs,
                              populate_seeds_batch)


def build_small(rng, n=500):
    seqs = []
    base = rng.integers(1, 5, size=n // 4, dtype=np.int8)
    for _ in range(4):
        s = base.copy()
        k = max(1, s.size // 12)
        p = rng.integers(0, s.size, size=k)
        s[p] = rng.integers(1, 5, size=k)
        seqs.append(s)
    return build_index(seqs, already_encoded=True)


def test_phi_batch_parity(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    qs = np.array([q for q in range(idx.n) if q != idx.sa0], dtype=np.int32)
    prev, lcp = phi_batch(tables, jnp.asarray(qs))
    prev, lcp = np.asarray(prev), np.asarray(lcp)
    for i, q in enumerate(qs):
        ep, el = refimpl.phi(idx, int(q))
        assert prev[i] == ep and lcp[i] == el, f"q={q}"
    qs2 = np.array([q for q in range(idx.n) if q != idx.sa_last],
                   dtype=np.int32)
    nxt, lcp2 = phi_inv_batch(tables, jnp.asarray(qs2))
    nxt, lcp2 = np.asarray(nxt), np.asarray(lcp2)
    for i, q in enumerate(qs2):
        ep, el = refimpl.phi_inv(idx, int(q))
        assert nxt[i] == ep and lcp2[i] == el, f"q={q}"


def test_enumerate_occs_vs_brute(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    t = idx.text
    starts, lens = [], []
    while len(starts) < 24:
        length = int(rng.integers(4, 14))
        pos = int(rng.integers(0, idx.n - length))
        if np.any(t[pos:pos + length] == 0):
            continue
        starts.append(pos)
        lens.append(length)
    starts = np.asarray(starts, np.int32)
    lens = np.asarray(lens, np.int32)
    active = np.ones(len(starts), bool)
    occs, cnt, _, _, _ = enumerate_occs(
        tables, jnp.asarray(starts), jnp.asarray(starts), jnp.asarray(lens),
        jnp.asarray(active), jnp.asarray(active), max_occs=64)
    occs, cnt = map(np.asarray, (occs, cnt))
    for i in range(len(starts)):
        expected = refimpl.brute_occurrences(t, int(starts[i]), int(lens[i]))
        if cnt[i] >= 64:
            continue
        got = set(occs[i, :cnt[i]].tolist())
        assert got == expected, f"lane {i}"
        # first element is the start, per reference emission order
        assert occs[i, 0] == starts[i]


def test_populate_seeds_covers_parent_and_halves(rng):
    idx = build_small(rng)
    tables = prepare_tables(idx)
    t = idx.text
    # a read equal to a text substring: guaranteed full-length MEM
    L = 60
    s = 25
    read = t[s:s + L].astype(np.int32)
    assert np.all(read != 0)
    reads = jnp.asarray(read[None, :])
    rl = jnp.asarray([L], dtype=np.int32)
    mp, ml, mi, mc, _ = find_mems_batch(tables, reads, rl, max_mems=8,
                                     min_len=20)
    seeds = populate_seeds_batch(tables, mp, ml, mi, mc, max_occs=32,
                                 min_len=20)
    seeds = {k: np.asarray(v) for k, v in seeds.items()}
    K = 8
    # parent seed occurrences = brute occurrences of the full MEM
    assert seeds["valid"][0, 0]
    par_occs = set(seeds["occs"][0, 0, :seeds["cnt"][0, 0]].tolist())
    assert par_occs == refimpl.brute_occurrences(t, int(mp[0, 0]), L)
    # split happened (L=60 >= 2*20): left half slot K, right half slot 2K
    assert seeds["valid"][0, K] and seeds["valid"][0, 2 * K]
    assert seeds["len"][0, K] == 30 and seeds["len"][0, 2 * K] == 30
    assert seeds["idx"][0, K] == seeds["idx"][0, 0]
    assert seeds["idx"][0, 2 * K] == seeds["idx"][0, 0] + 30
    # right half: full walk -> all its occurrences
    r_occs = set(seeds["occs"][0, 2 * K, :seeds["cnt"][0, 2 * K]].tolist())
    assert r_occs == refimpl.brute_occurrences(t, int(mp[0, 0]) + 30, 30)
    # left half: parent occs + left-half-only occs == all occurrences
    l_occs = set(seeds["occs"][0, K, :seeds["cnt"][0, K]].tolist())
    all_left = refimpl.brute_occurrences(t, int(mp[0, 0]), 30)
    assert l_occs <= all_left
    # left-half list contains the topmost-row occurrence and, combined
    # with the parent occurrences, covers everything
    assert l_occs | par_occs >= all_left
