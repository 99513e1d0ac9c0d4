from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.kernels.bcsr_spmm import BCSRPrepared, bcsr_prepare, bcsr_spmm_pallas
