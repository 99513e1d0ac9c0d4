from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    mlp_forward_sharded,
    pack_mlp,
)
from smmb_tpu.models.train import make_train_step, ternarize_ste
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    attention_forward,
    init_attention,
    pack_attention,
)
from smmb_tpu.models.transformer import (
    TernaryBlockConfig,
    block_forward,
    init_block,
    pack_block,
    qat_block_forward,
)
from smmb_tpu.models.moe import (
    TernaryMoEConfig,
    init_moe,
    make_moe_train_step,
    moe_forward,
    pack_moe,
    qat_moe_forward,
    route_top1,
)
from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_decode_step,
    lm_forward,
    lm_init_cache,
    lm_prefill,
    make_lm_train_step,
    pack_lm,
    qat_lm_forward,
)
