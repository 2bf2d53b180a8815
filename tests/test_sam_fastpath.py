"""Native batch SAM formatter == the Python record writer, byte-exact.

complete_batch_sam (native post-seed -> monitpu_format_sam_se) must
emit exactly what the record path (postseed_se -> SamRecord ->
write_sam_record) emits, including MAPQ, tags, reversed seq/qual and
unmapped records (reference write_sam, include/common/sam.hpp:144-188).
"""

import io

import numpy as np

from monitpu.index import build_index
from monitpu.align.aligner import Aligner, AlignConfig
from monitpu.align.sam import write_sam_record
from monitpu.index.alphabet import decode_seq, revcomp_codes


def _mk(rng, n=60000, haps=2, reads_n=120):
    base = rng.integers(1, 5, size=n, dtype=np.int8)
    seqs = [base]
    for _ in range(haps - 1):
        h = base.copy()
        h[rng.integers(0, n, n // 500)] = rng.integers(1, 5, n // 500)
        seqs.append(h)
    idx = build_index(seqs, names=[f"h{i}" for i in range(haps)],
                      already_encoded=True)
    reads = []
    for i in range(reads_n):
        s = int(rng.integers(0, idx.n - 160))
        codes = idx.text[s:s + 150].copy()
        codes[rng.integers(0, 150, 2)] = rng.integers(1, 5, 2)
        if i % 2:
            codes = revcomp_codes(codes)
        if i % 17 == 0:       # junk -> unmapped
            codes = rng.integers(1, 5, 150).astype(np.int8)
        qual = "I" * 150 if i % 3 else None
        reads.append((f"r{i}", decode_seq(codes), qual))
    return idx, reads


def test_sam_fastpath_byte_identity(rng):
    idx, reads = _mk(rng)
    al = Aligner(idx, AlignConfig())
    recs = al.align_batch(reads)
    buf = io.StringIO()
    for r in recs:
        write_sam_record(buf, r)
    want = buf.getvalue().encode()
    sam, o = al.complete_batch_sam(al.submit_batch(reads))
    assert sam == want
    flags = np.array([r.flag for r in recs])
    assert (o["flag"] == flags).all()


def test_sam_fastpath_cpu_engine_identity(rng):
    """The CPU engine's fast path must match the TPU path's bytes."""
    idx, reads = _mk(rng, reads_n=60)
    al = Aligner(idx, AlignConfig())
    sam_tpu, _ = al.complete_batch_sam(al.submit_batch(reads))
    cpu = Aligner(idx, AlignConfig(engine="cpu", postseed_threads=2))
    sam_cpu, _ = cpu.complete_batch_sam(cpu.submit_batch(reads))
    assert sam_tpu == sam_cpu


def test_sam_fastpath_split_phases(rng):
    """begin/finish split == one-shot completion."""
    idx, reads = _mk(rng, reads_n=40)
    al = Aligner(idx, AlignConfig())
    sam1, _ = al.complete_batch_sam(al.submit_batch(reads))
    p = al.begin_complete_sam(al.submit_batch(reads))
    sam2, _ = al.finish_complete_sam(p)
    assert sam1 == sam2


def test_sam_fastpath_pe_byte_identity(rng):
    """PE fast path (monitpu_format_sam_pe) == pe_records +
    write_sam_record, byte-exact, incl. proper pairs, orphan windows,
    unmapped mates (GATK convention), flips and missing quals."""
    from monitpu.align.paired import PairedAligner
    idx, _ = _mk(rng)
    text = np.asarray(idx.text)
    b1, b2 = [], []
    L = 100
    for i in range(96):
        s = int(rng.integers(0, idx.n - 420))
        ins = int(rng.integers(260, 340))
        frag = text[s:s + ins]
        m1 = frag[:L].copy()
        m2 = revcomp_codes(frag[-L:].copy().astype(np.int8))
        m1[rng.integers(0, L, 2)] = rng.integers(1, 5, 2)
        if i % 13 == 0:      # junk mate2 -> orphan / unmapped-mate path
            m2 = rng.integers(1, 5, L).astype(np.int8)
        if i % 19 == 0:      # junk both -> fully unmapped pair
            m1 = rng.integers(1, 5, L).astype(np.int8)
        qual = "I" * L if i % 3 else None
        b1.append((f"p{i}/1", decode_seq(m1.astype(np.int8)), qual))
        b2.append((f"p{i}/2", decode_seq(m2), qual))
    pal = PairedAligner(Aligner(idx, AlignConfig()))
    pal.learn_pair_batch(b1, b2)
    recs = pal.align_pair_batch(b1, b2)
    buf = io.StringIO()
    for r in recs:
        write_sam_record(buf, r)
    want = buf.getvalue().encode()
    sam, o = pal.complete_pair_batch_sam(pal.submit_pair_batch(b1, b2))
    assert sam == want
    assert int(o["aligned"].sum()) >= 80
