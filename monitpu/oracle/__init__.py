"""Reference-semantics oracle: a host-side aligner that reproduces the
reference's output semantics (chain scoring, piecewise fill_chain with
ksw2-extz extension/global alignments, MAPQ, SAM field assembly) for use
as the golden comparator of the TPU pipeline and as the measured CPU
baseline. See ksw2.py (kernel), chainer.py (find_chains), fill.py
(fill_chain/chain_score), se.py (single-end align)."""

from .ksw2 import extz
from .chainer import ChainParams, find_chains
from .se import OracleAligner, OracleParams
