from smmb_tpu.ops.dense import gemm, gemm_prelu, prelu
from smmb_tpu.ops.spmm import (
    bcsr_spmm,
    bcsr_spmm_prelu,
    packed_spmm_jnp,
    tcsc_spmm,
    tcsc_spmm_padded,
    tcsc_spmm_prelu,
)
