"""Differentiable packed SpMM (custom VJP) — frozen-weight fine-tuning path.

Serving weights are 2-bit and not trainable, but users fine-tune adapters
(LoRA-style) or probes on top of frozen ternary backbones, which needs
gradients THROUGH the packed layer w.r.t. activations. The backward matmul
``dx = g @ W^T`` is itself a ternary SpMM — with the transposed matrix — so
it runs through the same Pallas kernel against a second packed plane set
built from W^T at conversion time (2-bit × 2 = still 4× smaller than one
bf16 copy).

Usage:
    w_p, wt_p = pack_with_transpose(w_dense)
    layer = make_packed_linear(w_p, wt_p, alpha=0.2)
    y = layer(x, b)            # differentiable w.r.t. x and b

The PReLU epilogue's gradient is handled inside the VJP (mask from the
forward output: ``y > 0`` ⇔ pre-activation > 0 for any alpha > 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smmb_tpu.formats.packed import TernaryPacked, pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp


def pack_with_transpose(w_dense) -> tuple[TernaryPacked, TernaryPacked]:
    """Pack a ternary matrix and its transpose (jittable)."""
    w = jnp.asarray(w_dense)
    return pack_ternary_device(w), pack_ternary_device(w.T)


def make_packed_linear(
    w: TernaryPacked,
    w_t: TernaryPacked,
    alpha: float | None = None,
    compute_dtype=jnp.bfloat16,
    use_kernel: bool | None = None,
):
    """Build ``fn(x, b) -> prelu(x @ W + b, alpha)``, differentiable in
    (x, b). ``w_t`` must be the packed transpose of ``w``."""
    if (w.rows, w.cols) != (w_t.cols, w_t.rows):
        raise ValueError(
            f"w_t shape {w_t.shape} is not the transpose of w {w.shape}"
        )
    if alpha is not None and alpha < 0:
        # the backward mask is derived from the forward OUTPUT (y > 0),
        # which only equals the pre-activation sign for alpha >= 0
        raise ValueError(f"make_packed_linear requires alpha >= 0, got {alpha}")
    kern = (
        jax.default_backend() == "tpu" if use_kernel is None else use_kernel
    )

    def forward(x, b):
        if kern:
            return packed_spmm(x, w, b, alpha, compute_dtype=compute_dtype)
        return packed_spmm_jnp(x, w, b, alpha, dtype=compute_dtype)

    @jax.custom_vjp
    def fn(x, b):
        return forward(x, b)

    def fwd(x, b):
        y = forward(x, b)
        return y, y

    def bwd(y, g):
        if alpha is not None:
            # d prelu(z)/dz = 1 where z > 0 else alpha; y>0 ⇔ z>0 for α>0
            g = jnp.where(y > 0, g, alpha * g)
        g = g.astype(y.dtype)
        if kern:
            dx = packed_spmm(g, w_t, None, None, compute_dtype=compute_dtype)
        else:
            dx = packed_spmm_jnp(g, w_t, None, None, dtype=compute_dtype)
        return dx, jnp.sum(g.reshape(-1, g.shape[-1]), axis=0)

    fn.defvjp(fwd, bwd)
    return fn
