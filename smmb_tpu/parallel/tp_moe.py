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

from smmb_tpu.models.attention import _cache_write, apply_rope
from smmb_tpu.models.moe_block import TernaryMoEBlockConfig
from smmb_tpu.models.transformer import rmsnorm
from smmb_tpu.parallel.ep_moe import ep_ffn_body, shard_moe_ep
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from smmb_tpu.parallel.tp_transformer import (
    _cache_specs,
    _model_size,
    _qkv_local,
    attn_decode_half_tp,
    attn_half_tp,
    init_block_cache_tp,
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
    static_argnames=(
        "cfg", "mesh", "compute_dtype", "use_kernel", "precision", "use_flash"
    ),
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
    use_flash: bool = False,
) -> jax.Array:
    """TP-EP MoE block forward: x (B, T, d_model) batch-sharded over
    ``data``, replicated over ``model``; same placement out."""
    ms = _model_size(mesh)
    _check_divisible(cfg, ms)
    arrs, specs = _arrs_specs(packed)
    e_loc = cfg.n_experts // ms

    def body(d, x_l):
        # attention half: shared Megatron pairing, one psum
        x_mid = attn_half_tp(
            d, x_l, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel,
            precision, use_flash=use_flash,
        )
        return _moe_ffn_half_tp(
            d, x_mid, cfg, e_loc, compute_dtype, use_kernel
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)


def _moe_ffn_half_tp(d, x_mid, cfg, e_loc, compute_dtype, use_kernel):
    """Expert-parallel MoE half (inside shard_map): shared EP body, one
    psum; capacity is drop-free (models/moe.moe_forward's serving rule) —
    the dispatch is identical on every shard, so parity with the
    single-device ``_moe_half`` is exact."""
    bl, t, dm = x_mid.shape
    h2 = rmsnorm(x_mid, d["norm2"], cfg.eps).reshape(bl * t, dm)
    n = bl * t
    cap = max(8, -(-n // 8) * 8)
    stack = tuple(d["moe_" + k] for k in _EXPERT_KEYS)
    y = ep_ffn_body(
        h2, d["router"], stack, cfg.moe, e_loc, cap,
        compute_dtype, use_kernel,
    )
    return x_mid + y.reshape(bl, t, dm)


def _check_divisible(cfg: TernaryMoEBlockConfig, ms: int) -> None:
    if cfg.n_heads % ms or cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_heads={cfg.n_heads}/kv={cfg.attn.kv_heads} % model={ms} != 0"
        )
    if cfg.n_experts % ms:
        raise ValueError(f"n_experts={cfg.n_experts} % model={ms} != 0")


# ---------------------------------------------------------------------------
# TP-EP serving decode (head-sharded KV caches + expert-parallel MoE)
# ---------------------------------------------------------------------------


def init_moe_block_cache_tp(
    cfg: TernaryMoEBlockConfig,
    batch: int,
    max_len: int,
    mesh: Mesh,
    dtype=jnp.float32,
    quantized: bool = False,
) -> dict:
    """Head-sharded KV cache for one TP-EP MoE block — identical layout to
    the dense TP block's (everything cache-shaped lives in the attention
    half, which is the same Megatron pairing)."""
    return init_block_cache_tp(cfg, batch, max_len, mesh, dtype, quantized)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def moe_block_decode_step_tp(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryMoEBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> tuple[jax.Array, dict]:
    """One TP-EP serving decode step: x_t (B, 1, d_model) replicated over
    ``model``. Attention reads/writes only the shard's own heads
    (collective-free cache); the single token routes drop-free through the
    shard's experts; two psums total — the same collective count as the
    dense TP decode step."""
    ms = _model_size(mesh)
    _check_divisible(cfg, ms)
    arrs, specs = _arrs_specs(packed)
    cspecs = _cache_specs(cache)
    e_loc = cfg.n_experts // ms

    def body(d, x_l, c):
        x_mid, c = attn_decode_half_tp(
            d, x_l, c, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel,
            precision,
        )
        return _moe_ffn_half_tp(
            d, x_mid, cfg, e_loc, compute_dtype, use_kernel
        ), c

    y, cache = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None), cspecs),
        out_specs=(P(DATA_AXIS, None, None), cspecs),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x_t, cache)
    return y, cache


def moe_block_prefill_tp(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryMoEBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    """TP-EP prompt pass: full MoE block forward + head-sharded cache fill
    (the cache-fill Q/K/V projections are reused for the forward itself,
    mirroring tp_transformer.block_prefill_tp)."""
    ms = _model_size(mesh)
    _check_divisible(cfg, ms)
    arrs, specs = _arrs_specs(packed)
    cspecs = _cache_specs(cache)
    e_loc = cfg.n_experts // ms

    def body(d, x_l, c):
        bl, t, dm = x_l.shape
        h_loc = cfg.attn.n_heads // ms
        kvh_loc = cfg.attn.kv_heads // ms
        hd = cfg.attn.head_dim
        pos = c["pos"]
        h = rmsnorm(x_l, d["norm1"], cfg.eps).reshape(bl * t, dm)
        q, k, v = _qkv_local(
            d, h, bl, t, h_loc, kvh_loc, hd, compute_dtype, use_kernel, dm
        )
        if cfg.attn.rope:
            # cache stores roped keys (decode never re-rotates); the raw
            # k stays in qkv below — _attention_math ropes it internally
            k_cache = apply_rope(
                k, pos + jnp.arange(t), cfg.attn.rope_theta
            )
        else:
            k_cache = k
        c = _cache_write(c, k_cache, v, pos)
        x_mid = attn_half_tp(
            d, x_l, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel,
            precision, qkv=(q, k, v), use_flash=use_flash,
        )
        return _moe_ffn_half_tp(
            d, x_mid, cfg, e_loc, compute_dtype, use_kernel
        ), c

    y, cache = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None), cspecs),
        out_specs=(P(DATA_AXIS, None, None), cspecs),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x, cache)
    return y, cache
