"""Dense oracle ops — the framework's ground truth.

Mirrors the reference's validation oracles: ``gemm_basic`` computing
``Y = X·W + B`` with the bias broadcast over batch rows
(/root/reference/dense/dense.c:64-77) and the legacy ``GEMM_PReLU``
(/root/reference/SparseGEMM.h:135-149). The reference declares but never
defines ``gemm_prelu_basic`` (/root/reference/dense/dense.c:82-85 — dead
declaration); here the dense PReLU oracle is real, closing the gap SURVEY.md
§4 flags (PReLU variants were only ever cross-validated against each other).

Shapes follow the reference convention throughout the framework:
    X : (M, K) activations    W : (K, N) weights    B : (N,) bias
    Y : (M, N)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prelu(y: jax.Array, alpha: float) -> jax.Array:
    """PReLU epilogue: ``y if y > 0 else alpha * y``
    (/root/reference/sparse/tcsc.c:157-160)."""
    return jnp.where(y > 0, y, alpha * y)


def gemm(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Dense ``Y = X·W + B`` oracle (/root/reference/dense/dense.c:64-77).

    Defaults to HIGHEST precision: the TPU MXU otherwise executes f32 matmuls
    as single-pass bf16, which breaks the reference's fp32 1e-4 validation
    contract. Pass ``precision=None`` for realistic perf-baseline timing.
    """
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=precision)
    if b is not None:
        y = y + b
    return y


def gemm_prelu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None,
    alpha: float,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Dense GEMM + PReLU oracle (/root/reference/SparseGEMM.h:135-149)."""
    return prelu(gemm(x, w, b, precision), alpha)
