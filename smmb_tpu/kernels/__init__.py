from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.kernels.bcsr_spmm import BCSRPrepared, bcsr_prepare, bcsr_spmm_pallas
from smmb_tpu.kernels.packed_vjp import make_packed_linear, pack_with_transpose
