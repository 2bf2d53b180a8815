from .mapq import compute_mapq_se_bwa, compute_mapq_pe_bwa
from .sam import SamRecord, write_sam_record, sam_header, md_nm_from_ops
from .aligner import Aligner, AlignConfig
