"""Ternary MLP — the framework's flagship model family.

The reference's workload is a single MLP-style layer ``Y = PReLU(X·W + B)``
with a ternary W (/root/reference/main.cpp:258-268 test cases; SURVEY.md §5
"workloads are (batch M) × (features K→N) MLP-style layers"). The framework
generalizes it to the multi-layer ternary MLP called for by BASELINE.json
config 5: column-partitioned TCSC layers over a mesh, forward pass sharded
data×model.

Two execution paths share one parameter pytree:

* ``mlp_forward`` — single-device, packed 2-bit weights through the Pallas
  kernel (inference/serving path).
* ``mlp_forward_sharded`` — Megatron-style pairing over the mesh: odd layers
  column-parallel (activations leave feature-sharded), even layers
  row-parallel (psum over ICI restores replication). One collective per pair
  of layers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.formats.packed import pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.parallel.sharded import (
    shard_packed_columns,
    shard_packed_rows,
    sharded_spmm_column,
    sharded_spmm_row,
)
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class TernaryMLPConfig:
    layer_dims: tuple  # (d0, d1, ..., dL): L layers, layer i maps d_i -> d_{i+1}
    alpha: float = 0.2  # PReLU slope (/root/reference/main.cpp:268)
    non_zero: int = 2  # expected density 1/non_zero (ref generator semantics)

    @property
    def num_layers(self) -> int:
        return len(self.layer_dims) - 1


def init_mlp(key: jax.Array, cfg: TernaryMLPConfig) -> dict:
    """Random ternary weights + dense biases, reference distributions
    (/root/reference/dense/utils.h:9-68). Weights are dense float ternary
    here (the trainable/master form); ``pack_mlp`` produces the 2-bit
    serving form."""
    params = {"w": [], "b": []}
    for i in range(cfg.num_layers):
        key, kw, kb = jax.random.split(key, 3)
        params["w"].append(
            rng.rand_ternary(
                kw,
                (cfg.layer_dims[i], cfg.layer_dims[i + 1]),
                non_zero=cfg.non_zero,
            )
        )
        params["b"].append(rng.rand_dense(kb, (cfg.layer_dims[i + 1],)))
    return params


def pack_mlp(params: dict, quantize: bool = False) -> dict:
    """Master weights → packed serving weights.

    quantize=False (parity semantics): masters are already exact ternary
    matrices and are served as-is (per-layer scale 1).
    quantize=True (QAT semantics): masters are fp32; the served weight is
    ``absmean_scale(w) * ternarize(w)`` — exactly the effective weight
    models/train.qat_forward trains with. The scalar scale is stored per
    layer and folded into the activations at serve time (positive scaling
    commutes with PReLU), keeping the packed planes value-free.
    """
    from smmb_tpu.models.train import absmean_scale, ternarize_ste

    if quantize:
        terns = [ternarize_ste(w) for w in params["w"]]
        scales = [absmean_scale(w) for w in params["w"]]
    else:
        terns = list(params["w"])
        scales = [jnp.float32(1.0) for _ in params["w"]]
    return {
        "w": [pack_ternary_device(t) for t in terns],
        "b": list(params["b"]),
        "scale": scales,
    }


def _layer_scales(packed: dict):
    # packed dicts from before the quantize-aware format carry no scales
    return packed.get("scale", [None] * len(packed["w"]))


def mlp_forward(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMLPConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Single-device forward through packed layers (PReLU fused per layer)."""
    for w, b, s in zip(packed["w"], packed["b"], _layer_scales(packed)):
        if s is not None:
            x = x * s  # weight scale folded into activations (s > 0)
        if use_kernel:
            x = packed_spmm(
                x, w, b, alpha=cfg.alpha, compute_dtype=compute_dtype
            )
        else:
            x = packed_spmm_jnp(x, w, b, alpha=cfg.alpha, dtype=compute_dtype)
    return x


def shard_mlp(packed: dict, mesh) -> dict:
    """Place packed layers on the mesh: alternate column / row sharding."""
    out = {"w": [], "b": [], "scale": list(_layer_scales(packed))}
    for i, (w, b) in enumerate(zip(packed["w"], packed["b"])):
        out["w"].append(
            shard_packed_columns(w, mesh)
            if i % 2 == 0
            else shard_packed_rows(w, mesh)
        )
        out["b"].append(b)
    return out


def mlp_forward_sharded(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMLPConfig,
    *,
    mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Mesh-sharded forward (BASELINE.json config 5).

    Even layers column-parallel, odd layers row-parallel: activations stay
    feature-sharded between the pair, and the only collective is the psum
    closing each pair (or a final one if the depth is odd — then the last
    column layer's output is gathered so the caller sees a replicated Y).
    """
    n = cfg.num_layers
    scales = _layer_scales(packed)
    for i in range(n):
        w, b = packed["w"][i], packed["b"][i]
        if scales[i] is not None:
            x = x * scales[i]
        if i % 2 == 0:
            x = sharded_spmm_column(
                x,
                w,
                b,
                mesh=mesh,
                alpha=cfg.alpha,
                compute_dtype=compute_dtype,
                use_kernel=use_kernel,
            )
        else:
            x = sharded_spmm_row(
                x,
                w,
                b,
                mesh=mesh,
                alpha=cfg.alpha,
                compute_dtype=compute_dtype,
                use_kernel=use_kernel,
            )
    if n % 2 == 1:
        # odd depth: result is feature-sharded; gather for a replicated Y
        x = jax.lax.with_sharding_constraint(
            x,
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data", None)
            ),
        )
    return x
