from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    mlp_forward_sharded,
    pack_mlp,
)
from smmb_tpu.models.train import make_train_step, ternarize_ste
