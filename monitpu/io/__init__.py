from .fastq import read_fastq_batches, read_fasta, read_paired_batches
