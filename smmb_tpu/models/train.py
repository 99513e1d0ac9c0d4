"""Quantization-aware training for ternary MLPs (net-new).

The reference is inference-only (no training, SURVEY.md summary). For the
framework to be a complete ternary-weight stack, this adds the standard
straight-through-estimator (STE) recipe: fp32 master weights, ternarized on
the forward pass with gradients passing through unchanged, so the serving
artifact is exactly the 2-bit packed format the kernels consume.

Ternarization follows the absmean rule used by ternary-LLM training
(W_q = clip(round(W / mean|W|), -1, 1)): the scale is folded into the layer
bias-free scale vector rather than the packed planes, keeping the packed
format value-free like TCSC (/root/reference/sparse/tcsc.h:6-17 — values are
implicit ±1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from smmb_tpu.ops.dense import prelu


@jax.custom_vjp
def ternarize_ste(w: jax.Array) -> jax.Array:
    """Absmean ternarization with straight-through gradients.

    Returns the *unscaled* ternary matrix in {-1, 0, +1} (float); the
    per-tensor scale is recovered by the caller via ``absmean_scale`` so the
    packed serving format stays value-free.
    """
    scale = jnp.mean(jnp.abs(w)) + 1e-8
    return jnp.clip(jnp.round(w / scale), -1.0, 1.0)


def _ternarize_fwd(w):
    return ternarize_ste(w), None


def _ternarize_bwd(_, g):
    return (g,)  # straight-through: d(quantize)/dw ≈ I


ternarize_ste.defvjp(_ternarize_fwd, _ternarize_bwd)


def absmean_scale(w: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(w)) + 1e-8


def qat_forward(params: dict, x: jax.Array, alpha: float) -> jax.Array:
    """Training-path forward: dense matmuls against STE-ternarized masters.

    Mirrors the serving math of smmb_tpu/models/mlp.py exactly (per-layer
    ``prelu(x @ (scale * ternary(W)) + b, alpha)``) but stays differentiable;
    the MXU runs dense bf16/f32 matmuls here, the packed Pallas kernel is the
    inference twin.
    """
    for w, b in zip(params["w"], params["b"]):
        wq = ternarize_ste(w) * absmean_scale(w)
        x = prelu(jnp.dot(x, wq, preferred_element_type=jnp.float32) + b, alpha)
    return x


def make_train_step(alpha: float = 0.2, learning_rate: float = 1e-3):
    """Build (init_opt, train_step) for MSE regression on the ternary MLP.

    ``train_step(params, opt_state, x, y) -> (params, opt_state, loss)`` is
    pure and jittable; sharded variants jit it over a mesh with sharding
    annotations (see __graft_entry__.dryrun_multichip).
    """
    tx = optax.adam(learning_rate)

    def loss_fn(params, x, y):
        pred = qat_forward(params, x, alpha)
        return jnp.mean((pred - y) ** 2)

    def init_opt(params):
        return tx.init(params)

    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, train_step
