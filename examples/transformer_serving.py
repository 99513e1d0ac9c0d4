#!/usr/bin/env python
"""Example: serving a ternary transformer block with packed 2-bit weights.

    python examples/transformer_serving.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smmb_tpu.models.transformer import (
    TernaryBlockConfig,
    block_forward,
    init_block,
    pack_block,
)
from smmb_tpu.utils import rng


def main():
    use_kernel = jax.default_backend() == "tpu"
    cfg = TernaryBlockConfig(d_model=512, n_heads=8, d_ff=2048, causal=True)
    params = init_block(jax.random.PRNGKey(0), cfg)
    packed = pack_block(params)

    packed_bytes = sum(
        int(np.asarray(v.data).nbytes)
        for v in [packed["w_up"], packed["w_down"]]
        + [packed["attn"][n] for n in ("wq", "wk", "wv", "wo")]
    )
    dense_bytes = 4 * (2 * cfg.d_model * cfg.d_ff + 4 * cfg.d_model**2)
    print(
        f"block weights: {packed_bytes / 1024:.0f} KiB packed "
        f"vs {dense_bytes / 1024:.0f} KiB dense fp32 "
        f"({dense_bytes / packed_bytes:.1f}x smaller)"
    )

    x = rng.rand_dense(jax.random.PRNGKey(1), (2, 64, cfg.d_model))
    y = block_forward(packed, x, cfg, use_kernel=use_kernel)
    print(
        f"served {x.shape[0] * x.shape[1]} tokens -> {y.shape}, "
        f"finite: {bool(np.isfinite(np.asarray(y)).all())}"
    )


if __name__ == "__main__":
    main()
