from smmb_tpu.parallel.bcsr_sharded import (
    shard_bcsr_columns,
    sharded_bcsr_spmm,
)
from smmb_tpu.parallel.dp_train import make_lm_train_step_dp
from smmb_tpu.parallel.mesh import make_mesh
from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped
from smmb_tpu.parallel.ep_moe import moe_forward_ep, shard_moe_ep
from smmb_tpu.parallel.pp_lm import lm_forward_pp, shard_lm_pp
from smmb_tpu.parallel.ring_attention import attention_forward_sp, ring_attention
from smmb_tpu.parallel.sp_block import block_forward_sp, lm_forward_sp
from smmb_tpu.parallel.tp_moe import moe_block_forward_tp, shard_moe_block_tp
from smmb_tpu.parallel.sharded import (
    shard_packed_columns,
    shard_packed_rows,
    sharded_spmm_column,
    sharded_spmm_row,
)
from smmb_tpu.parallel.tp_transformer import (
    block_decode_step_tp,
    block_forward_tp,
    block_prefill_tp,
    generate_tp,
    init_block_cache_tp,
    lm_decode_step_tp,
    lm_forward_tp,
    lm_init_cache_tp,
    lm_prefill_tp,
    shard_block_tp,
    shard_lm_tp,
)
