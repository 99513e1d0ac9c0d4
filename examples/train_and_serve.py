#!/usr/bin/env python
"""End-to-end example: train a ternary MLP with STE, convert to the 2-bit
serving format, run the packed Pallas kernel, and save/load the artifact.

Runs on CPU (Pallas in interpreter mode) or TPU. ~30s on CPU.

    python examples/train_and_serve.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from smmb_tpu import io as smio
from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    mlp_forward,
    pack_mlp,
)
from smmb_tpu.models.train import make_train_step
from smmb_tpu.utils import rng


def main():
    cfg = TernaryMLPConfig(layer_dims=(64, 128, 64), alpha=0.2)
    kp, kx, ky = jax.random.split(jax.random.PRNGKey(0), 3)

    # fp32 master weights (start near-ternary like a quantized init)
    params = {
        "w": [
            0.3 * rng.rand_dense(k, (cfg.layer_dims[i], cfg.layer_dims[i + 1]))
            for i, k in enumerate(jax.random.split(kp, cfg.num_layers))
        ],
        "b": [jnp.zeros((d,)) for d in cfg.layer_dims[1:]],
    }

    x = rng.rand_dense(kx, (256, 64))
    y = rng.rand_dense(ky, (256, 64))

    init_opt, step = make_train_step(alpha=cfg.alpha, learning_rate=3e-3)
    opt_state = init_opt(params)
    jstep = jax.jit(step)
    for i in range(50):
        params, opt_state, loss = jstep(params, opt_state, x, y)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.5f}")

    # ----- convert: QAT rule (absmean scale x ternarized masters) -> packed
    packed = pack_mlp(params, quantize=True)
    for i, w in enumerate(packed["w"]):
        print(
            f"layer {i}: packed {w.data.shape} int8 "
            f"({w.weight_bytes()} B vs {4 * w.rows * w.cols} B dense fp32)"
        )

    # ----- serve (Pallas on TPU, jnp path elsewhere)
    use_kernel = jax.default_backend() == "tpu"
    out = mlp_forward(packed, x, cfg, use_kernel=use_kernel)
    print("serving output:", out.shape, "finite:", bool(np.isfinite(np.asarray(out)).all()))

    # ----- save / load the serving artifact
    smio.save_packed_mlp("/tmp/ternary_mlp.npz", packed)
    back = smio.load_packed_mlp("/tmp/ternary_mlp.npz")
    out2 = mlp_forward(back, x, cfg, use_kernel=use_kernel)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    print("artifact round-trip OK -> /tmp/ternary_mlp.npz")


if __name__ == "__main__":
    main()
