"""Tensor-parallel attention + expert-parallel FFN for MoE blocks.

The multi-chip MoE serving configuration ("Mixtral on a pod"): one
``shard_map`` per block where the SAME ``model`` mesh axis carries both
partitionings —

* attention: Megatron head sharding (column QKV, row out-proj, one psum),
  exactly tp_transformer.py's pairing;
* FFN: whole experts sharded on the stacked leading axis (ep_moe.py's
  recipe) — every shard routes ALL tokens against the replicated router
  (activations are model-replicated under TP, so routing is computed
  identically everywhere and needs no exchange), computes slabs for its
  own experts only, and one psum assembles the combine.

Two psums per block total, same as the dense TP block. Serving routes
drop-free (models/moe.moe_forward's rule): with the dispatch identical on
every shard and no capacity competition, the TP-EP forward equals the
single-device ``moe_block_forward`` exactly (up to psum summation order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.models.moe_block import TernaryMoEBlockConfig
from smmb_tpu.models.transformer import rmsnorm
from smmb_tpu.parallel.ep_moe import ep_ffn_body, shard_moe_ep
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from smmb_tpu.parallel.tp_transformer import (
    _model_size,
    attn_half_tp,
    shard_attn_megatron,
)

_EXPERT_KEYS = ("w_up", "s_up", "b_up", "w_down", "s_down", "b_down")


def _reject_lora_tpep(packed: dict) -> None:
    if any(
        k.endswith("_lora")
        for k in list(packed) + list(packed.get("attn", ()))
    ):
        raise ValueError(
            "LoRA adapters are not supported on the TP-EP path yet — "
            "serve adapted models through the single-device API"
        )


def shard_moe_block_tp(packed: dict, mesh: Mesh) -> dict:
    """Place one packed MoE block (models/moe_block.pack_moe_block):
    attention Megatron-sharded, experts expert-parallel, norms replicated."""
    _reject_lora_tpep(packed)
    repl1 = NamedSharding(mesh, P(None))
    return {
        "attn": shard_attn_megatron(packed["attn"], mesh),
        "moe": shard_moe_ep(packed["moe"], mesh),
        "norm1": jax.device_put(packed["norm1"], repl1),
        "norm2": jax.device_put(packed["norm2"], repl1),
    }


def _arrs_specs(packed: dict):
    _reject_lora_tpep(packed)
    a, m = packed["attn"], packed["moe"]
    arrs = {
        "norm1": packed["norm1"], "norm2": packed["norm2"],
        "router": m["router"],
    }
    for name in ("wq", "wk", "wv", "wo"):
        arrs[name] = a[name].data
        arrs["s" + name[1]] = a[name + "_scale"]
        arrs[name.replace("w", "b")] = a[name.replace("w", "b")]
    for k in _EXPERT_KEYS:
        arrs["moe_" + k] = m[k]
    specs = {
        "norm1": P(None), "norm2": P(None), "router": P(None, None),
        "wq": P(None, MODEL_AXIS), "wk": P(None, MODEL_AXIS),
        "wv": P(None, MODEL_AXIS), "wo": P(MODEL_AXIS, None),
        "sq": P(), "sk": P(), "sv": P(), "so": P(),
        "bq": P(MODEL_AXIS), "bk": P(MODEL_AXIS), "bv": P(MODEL_AXIS),
        "bo": P(None),
    }
    for k in _EXPERT_KEYS:
        specs["moe_" + k] = jax.tree.map(
            lambda _: P(MODEL_AXIS), arrs["moe_" + k]
        )
    return arrs, specs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def moe_block_forward_tp(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMoEBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """TP-EP MoE block forward: x (B, T, d_model) batch-sharded over
    ``data``, replicated over ``model``; same placement out."""
    ms = _model_size(mesh)
    if cfg.n_heads % ms or cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_heads={cfg.n_heads}/kv={cfg.attn.kv_heads} % model={ms} != 0"
        )
    if cfg.n_experts % ms:
        raise ValueError(f"n_experts={cfg.n_experts} % model={ms} != 0")
    arrs, specs = _arrs_specs(packed)
    e_loc = cfg.n_experts // ms

    def body(d, x_l):
        bl, t, dm = x_l.shape
        # attention half: shared Megatron pairing, one psum
        x_mid = attn_half_tp(
            d, x_l, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel,
            precision,
        )
        # expert-parallel MoE half: shared EP body, one psum; capacity is
        # drop-free (models/moe.moe_forward's serving rule) — the
        # dispatch is identical on every shard, so parity is exact
        h2 = rmsnorm(x_mid, d["norm2"], cfg.eps).reshape(bl * t, dm)
        n = bl * t
        cap = max(8, -(-n // 8) * 8)
        stack = tuple(d["moe_" + k] for k in _EXPERT_KEYS)
        y = ep_ffn_body(
            h2, d["router"], stack, cfg.moe, e_loc, cap,
            compute_dtype, use_kernel,
        )
        return x_mid + y.reshape(bl, t, dm)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)
