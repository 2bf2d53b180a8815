"""Host-side FASTA/FASTQ reading in batches.

Replaces the reference's klib kseq + kbseq/kpbseq batched readers
(include/common/kpbseq.h:315-386): batches of b reads are pulled from
the (optionally gzipped) stream and handed to the device pipeline; the
paired reader keeps mate files in lockstep like kpbseq_read."""

from __future__ import annotations

import gzip


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def _fastx_records(path):
    """Yield (name, seq, qual|None) from FASTA or FASTQ."""
    with _open(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == ">":
            name = f.readline().strip().split()[0]
            seq = []
            for line in f:
                if line.startswith(">"):
                    yield name, "".join(seq), None
                    name = line[1:].strip().split()[0]
                    seq = []
                else:
                    seq.append(line.strip())
            yield name, "".join(seq), None
        elif first == "@":
            name = f.readline().strip().split()[0]
            while True:
                seq = f.readline().strip()
                f.readline()  # +
                qual = f.readline().strip()
                yield name, seq, qual
                hdr = f.readline()
                if not hdr:
                    return
                name = hdr[1:].strip().split()[0]
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ")


def read_fasta(path):
    """[(name, seq_str)] for index building."""
    return [(n, s) for n, s, _ in _fastx_records(path)]


def read_fastq_batches(path, batch_size=512):
    """Yield lists of (name, seq, qual) of size <= batch_size."""
    batch = []
    for rec in _fastx_records(path):
        batch.append(rec)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def read_paired_batches(path1, path2, batch_size=512):
    """Yield (batch1, batch2) in lockstep (kpbseq_read semantics)."""
    it1 = _fastx_records(path1)
    it2 = _fastx_records(path2)
    b1, b2 = [], []
    for r1, r2 in zip(it1, it2):
        b1.append(r1)
        b2.append(r2)
        if len(b1) == batch_size:
            yield b1, b2
            b1, b2 = [], []
    if b1:
        yield b1, b2
