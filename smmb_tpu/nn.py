"""Flax modules — drop-in ternary layers for user models (net-new surface).

The reference exposes raw C functions; a TPU framework's users live in
flax/optax land, so the packed kernels get module form here:

- ``TernaryDense``: QAT layer — fp32 master kernel, STE-ternarized on every
  forward (smmb_tpu/models/train.py recipe), differentiable, jit/pjit-safe.
- ``PackedTernaryDense``: frozen serving layer over a ``TernaryPacked``
  weight (2-bit planes through the Pallas kernel).
- ``convert_to_packed``: TernaryDense params → packed serving params.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

try:
    import flax.linen as fnn

    _FLAX = True
except Exception:  # pragma: no cover - flax is in the base image
    _FLAX = False

from smmb_tpu.formats.packed import TernaryPacked, pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.models.train import absmean_scale, ternarize_ste
from smmb_tpu.ops.dense import prelu
from smmb_tpu.ops.spmm import packed_spmm_jnp

if _FLAX:

    class TernaryDense(fnn.Module):
        """Quantization-aware ternary dense layer: y = act(x @ (s·T(W)) + b).

        ``T`` is absmean STE ternarization; the effective weight is exactly
        representable by the 2-bit serving format times one fp scale.
        """

        features: int
        use_bias: bool = True
        alpha: float | None = 0.2  # PReLU slope; None = linear
        kernel_init: Callable = fnn.initializers.lecun_normal()
        bias_init: Callable = fnn.initializers.zeros_init()

        @fnn.compact
        def __call__(self, x):
            k = x.shape[-1]
            w = self.param("kernel", self.kernel_init, (k, self.features))
            wq = ternarize_ste(w) * absmean_scale(w)
            y = jnp.dot(x, wq, preferred_element_type=jnp.float32)
            if self.use_bias:
                y = y + self.param("bias", self.bias_init, (self.features,))
            if self.alpha is not None:
                y = prelu(y, self.alpha)
            return y.astype(x.dtype)

    class PackedTernaryDense(fnn.Module):
        """Frozen serving layer: 2-bit packed weights through the Pallas
        kernel. Parameters are the packed planes (int8, non-trainable in
        practice), a scalar weight scale, and the bias."""

        features: int
        in_features: int
        use_bias: bool = True
        alpha: float | None = 0.2
        compute_dtype: Any = jnp.bfloat16
        use_kernel: bool | None = None  # None = Pallas on TPU, jnp elsewhere

        @fnn.compact
        def __call__(self, x):
            from smmb_tpu.formats.packed import GROUP_ROWS

            packed_rows = (
                -(-max(self.in_features, 1) // GROUP_ROWS) * GROUP_ROWS // 4
            )
            data = self.param(
                "packed_kernel",
                fnn.initializers.zeros_init(),
                (packed_rows, self.features),
                jnp.int8,
            )
            scale = self.param(
                "kernel_scale", fnn.initializers.ones_init(), (), jnp.float32
            )
            w = TernaryPacked(
                data=data, rows=self.in_features, cols=self.features, nnz=-1
            )
            use_kernel = (
                jax.default_backend() == "tpu"
                if self.use_kernel is None
                else self.use_kernel
            )
            b = (
                self.param(
                    "bias",
                    fnn.initializers.zeros_init(),
                    (self.features,),
                    jnp.float32,
                )
                if self.use_bias
                else None
            )
            # scale multiplies the ±1 weights; fold into x (cheaper than
            # rescaling the output when PReLU follows: prelu commutes with
            # positive scaling, so either side works — fold pre-matmul).
            xs = x * scale
            if use_kernel:
                return packed_spmm(
                    xs, w, b, self.alpha, compute_dtype=self.compute_dtype
                )
            return packed_spmm_jnp(
                xs, w, b, self.alpha, dtype=self.compute_dtype
            )


def convert_to_packed(params: dict) -> dict:
    """TernaryDense param tree → PackedTernaryDense param tree.

    Walks the pytree; every dict holding a 2D ``kernel`` is converted to
    ``packed_kernel`` (2-bit planes) + ``kernel_scale`` (absmean), preserving
    everything else (biases, nesting).
    """

    def convert(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                w = node["kernel"]
                tern = ternarize_ste(w)
                out = {
                    "packed_kernel": pack_ternary_device(tern).data,
                    "kernel_scale": absmean_scale(w),
                }
                for k, v in node.items():
                    if k != "kernel":
                        out[k] = v
                return out
            return {k: convert(v) for k, v in node.items()}
        return node

    return convert(params)
