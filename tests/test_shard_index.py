"""Position-range index sharding (parallel/shard_index.py): the
beyond-HBM MS backward search must be bit-identical to the replicated
kernel, with each shard holding only its 1/D slice of the pos->run map
and the lf8 rows."""

import numpy as np
import pytest

import jax

from monitpu.index import build_index
from monitpu.index.alphabet import revcomp_codes
from monitpu.ops.ms import prepare_tables_host, stage_tables, \
    ms_pointers_batch
from monitpu.parallel.mesh import make_mesh
from monitpu.parallel.shard_index import shard_lf_tables, \
    ms_pointers_sharded


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(91)
    base = rng.integers(1, 5, size=30_000, dtype=np.int8)
    seqs = []
    for _ in range(3):
        s = base.copy()
        p = rng.integers(0, s.size, size=s.size // 120)
        s[p] = rng.integers(1, 5, size=p.size)
        seqs.append(s)
    idx = build_index(seqs, already_encoded=True)
    host = prepare_tables_host(idx)
    B, M = 32, 128
    reads = np.zeros((B, M), np.int32)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        hap = b % 3
        L = int(rng.integers(60, M))
        s = int(rng.integers(0, len(seqs[hap]) - L))
        codes = seqs[hap][s:s + L].copy()
        codes[rng.integers(0, L, 2)] = rng.integers(1, 5, 2)
        if b % 2:
            codes = revcomp_codes(codes.astype(np.int8))
        reads[b, :L] = codes
        lens[b] = L
    return host, reads, lens


def test_sharded_lf_bit_parity(setup):
    host, reads, lens = setup
    assert len(jax.devices("cpu")) >= 8
    mesh = make_mesh(8)
    want = np.asarray(ms_pointers_batch(stage_tables(host),
                                        reads, lens))
    sharded = shard_lf_tables(host, 8)
    # each shard's slice really is ~1/8 of the index
    assert sharded["run_idx_loc"].shape[1] <= host["run_idx"].size // 8 + 8
    got = np.asarray(ms_pointers_sharded(mesh, sharded, reads, lens))
    assert np.array_equal(want, got)


def test_sharded_lf_uneven_mesh(setup):
    """Non-power-of-two shard count: padding rows must stay inert."""
    host, reads, lens = setup
    mesh = make_mesh(4)
    want = np.asarray(ms_pointers_batch(stage_tables(host),
                                        reads, lens))
    got = np.asarray(ms_pointers_sharded(mesh, shard_lf_tables(host, 4),
                                         reads, lens))
    assert np.array_equal(want, got)
