from .alphabet import (
    SIGMA, SEP, A, C, G, T, N, encode_seq, decode_seq, revcomp_codes
)
from .schema import MoniIndex
from .build import build_index, suffix_array, bwt_from_sa, lcp_kasai
