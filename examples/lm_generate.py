#!/usr/bin/env python
"""End-to-end example: train a tiny ternary LM with STE, pack it to the
2-bit serving format, and greedy-generate with the KV-cache decode path.

Runs on CPU (Pallas in interpreter mode) or TPU. ~1 min on CPU.

    python examples/lm_generate.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    make_lm_train_step,
    pack_lm,
)


def main():
    cfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=2, max_len=64
    )
    params = init_lm(jax.random.PRNGKey(0), cfg)
    # non-degenerate fp32 masters for STE training
    params = jax.tree.map(lambda a: a + 0.01, params)

    # ----- "data": memorize a repeating token pattern
    pattern = jnp.arange(32) % 8
    toks = jnp.tile(pattern, (8, 1))  # (8, 32)

    init_opt, step = make_lm_train_step(cfg, learning_rate=3e-3)
    opt_state = init_opt(params)
    jstep = jax.jit(step)
    for i in range(60):
        params, opt_state, loss = jstep(params, opt_state, toks)
        if i % 15 == 0:
            print(f"step {i:3d}  xent {float(loss):.4f}")

    # ----- convert: QAT rule -> 2-bit packed blocks + head
    packed = pack_lm(params, quantize=True)
    w = packed["blocks"][0]["attn"]["wq"]
    print(
        f"packed wq: {w.data.shape} int8 "
        f"({w.weight_bytes()} B vs {4 * w.rows * w.cols} B dense fp32)"
    )

    # ----- serve: single-jit greedy generate (prefill + lax.scan decode)
    use_kernel = jax.default_backend() == "tpu"
    prompt = pattern[None, :8]
    out = generate(packed, prompt, cfg, steps=16, use_kernel=use_kernel)
    print("prompt:      ", np.asarray(prompt)[0])
    print("continuation:", np.asarray(out)[0])
    # a well-trained LM continues the period-8 pattern
    want = (np.arange(8, 24) % 8).astype(np.asarray(out).dtype)
    acc = float((np.asarray(out)[0] == want).mean())
    print(f"pattern accuracy: {acc * 100:.0f}%")


if __name__ == "__main__":
    main()
