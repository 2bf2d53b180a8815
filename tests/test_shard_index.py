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
    return idx, host, reads, lens


def test_sharded_lf_bit_parity(setup):
    _, host, reads, lens = setup
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
    _, host, reads, lens = setup
    mesh = make_mesh(4)
    want = np.asarray(ms_pointers_batch(stage_tables(host),
                                        reads, lens))
    got = np.asarray(ms_pointers_sharded(mesh, shard_lf_tables(host, 4),
                                         reads, lens))
    assert np.array_equal(want, got)


def test_sharded_full_stage_bit_parity(setup):
    """The FULL seed stage (LF scan + LCE + Phi occurrence walks +
    packed wire) over position-range-sharded tables must be
    bit-identical to the replicated fused stage (VERDICT r4 next #4:
    sharding beyond the LF step)."""
    from monitpu.ops.occs import seed_stage_fused
    from monitpu.parallel.shard_index import (shard_seed_tables,
                                              stage_sharded,
                                              make_sharded_seed_stage)
    _, host, reads, lens = setup
    B, M = reads.shape
    W, OC = 8 * B, 48 * B
    want_seeds, want_wire = seed_stage_fused(
        stage_tables(host), reads, lens, max_mems=8, min_len=20,
        work_per_read=24, max_occs=16, W=W, occ_cap=OC)
    mesh = make_mesh(8)
    dev = stage_sharded(mesh, shard_seed_tables(host, 8))
    run = make_sharded_seed_stage(mesh, dev, max_mems=8, min_len=20,
                                  work_per_read=24, max_occs=16, W=W,
                                  occ_cap=OC)
    got_seeds, got_wire, _ = run(reads, lens)
    assert np.array_equal(np.asarray(want_wire), np.asarray(got_wire))
    for k in want_seeds:
        assert np.array_equal(np.asarray(want_seeds[k]),
                              np.asarray(got_seeds[k])), k


def test_sharded_index_end_to_end_sam(setup):
    """Aligning a batch against the index-sharded layout on the 8-CPU
    mesh must produce byte-identical SAM to the replicated layout, with
    the sharded device extz score pass serving the batch."""
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.index.alphabet import decode_seq
    idx, _, reads_arr, lens = setup
    reads = [(f"r{b}", decode_seq(reads_arr[b, :lens[b]].astype(np.int8)),
              "I" * int(lens[b]))
             for b in range(reads_arr.shape[0])]
    cfg = AlignConfig(max_occs=32, postseed_threads=2)
    rep = Aligner(idx, cfg)
    want, _ = rep.complete_batch_sam(rep.submit_batch(reads))

    sh = Aligner(idx, cfg)
    sh.enable_index_sharding(8)
    got, _ = sh.complete_batch_sam(sh.submit_batch(reads))
    assert sh.stats.get("extz_device_batches", 0) >= 1
    assert got == want


def test_sharded_index_pe_end_to_end_sam(setup):
    """PE through the index-sharded layout (split SE-shaped dispatches
    routed to the sharded stage): byte-identical interleaved SAM."""
    from monitpu.align.aligner import Aligner, AlignConfig
    from monitpu.align.paired import PairedAligner
    from monitpu.index.alphabet import decode_seq
    idx, _, _, _ = setup
    rng = np.random.default_rng(17)
    text = np.asarray(idx.text)
    starts = np.asarray(idx.seq_starts)
    b1, b2 = [], []
    L = 100
    for i in range(24):
        hap = int(rng.integers(0, len(starts) - 1))
        ins = int(rng.integers(250, 330))
        lo, hi = int(starts[hap]), int(starts[hap + 1]) - 1 - ins
        s = int(rng.integers(lo, hi))
        frag = text[s:s + ins]
        m1 = frag[:L].copy().astype(np.int8)
        m2 = revcomp_codes(frag[-L:].copy().astype(np.int8))
        b1.append((f"p{i}/1", decode_seq(m1), "I" * L))
        b2.append((f"p{i}/2", decode_seq(m2), "I" * L))
    cfg = AlignConfig(max_occs=32, postseed_threads=2)
    single = PairedAligner(Aligner(idx, cfg))
    single.learn_pair_batch(b1, b2)
    want, _ = single.complete_pair_batch_sam(
        single.submit_pair_batch(b1, b2))

    al = Aligner(idx, cfg)
    al.enable_index_sharding(8)
    sharded = PairedAligner(al)
    sharded.ins = single.ins
    got, _ = sharded.complete_pair_batch_sam(
        sharded.submit_pair_batch(b1, b2))
    assert got == want


def test_auto_layout_choice(setup):
    """table_layout='auto' resolves from HBM arithmetic."""
    from monitpu.parallel.mesh import choose_table_layout, table_bytes
    idx, _, _, _ = setup
    assert choose_table_layout(idx, hbm_bytes=16e9) == "fused"
    fb = table_bytes(idx.n, idx.r, "fused")
    cb = table_bytes(idx.n, idx.r, "compact")
    assert choose_table_layout(idx, hbm_bytes=fb / 0.6 * 0.9) == "compact"
    assert choose_table_layout(idx, hbm_bytes=cb / 0.6 * 0.5) == "sharded"
