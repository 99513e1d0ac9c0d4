"""Sequence-parallel transformer block and LM forward (long-context).

Completes the sp column of the parallelism matrix above the attention
layer (parallel/ring_attention.py): the whole block — norms, ternary
projections, MLP — is per-token work that runs shard-local on the
sequence shard, so ONE ``shard_map`` wraps the entire block and the only
collectives are the ring's S−1 KV ``ppermute`` rotations. Peak per-device
activation memory is O(B·T/S·D): a context S× longer fits the same HBM.

The reference has no sequence axis (SURVEY.md §5 maps its absence); this
module is the long-context prefill analog of tp_transformer.py — use TP
when the model is too big per chip, SP when the *context* is.

Weights are replicated (they are 2-bit packed — a 4096² ternary matrix is
4 MB; replication is cheaper than the collectives weight-sharding would
add to every token).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.models.transformer import TernaryBlockConfig, rmsnorm
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from smmb_tpu.parallel.ring_attention import _ring_body
from smmb_tpu.parallel.sharded import _local_spmm


def _block_arrs_specs(packed: dict):
    """Flatten a pack_block / pack_moe_block dict to (arrays, replicated
    specs) for shard_map (TernaryPacked planes enter as raw data; all
    replicated — weights are 2-bit, replication is cheaper than the
    collectives weight-sharding would add per token)."""
    keys = list(packed) + list(packed["attn"])
    if any(k.endswith("_lora") for k in keys):
        raise ValueError(
            "LoRA adapters are not supported on the sequence-parallel "
            "path yet — serve adapted models through the single-device API"
        )
    a = packed["attn"]
    arrs = {"norm1": packed["norm1"], "norm2": packed["norm2"]}
    if "moe" in packed:
        # stacked expert weights (leading E axis), router dense
        m = packed["moe"]
        arrs["moe_router"] = m["router"]
        for n in ("w_up", "w_down"):
            arrs["moe_" + n] = m[n].data
            arrs["moe_s" + n[1:]] = m["s" + n[1:]]
            arrs["moe_b" + n[1:]] = m["b" + n[1:]]
    else:
        arrs.update({
            "w_up": packed["w_up"].data, "s_up": packed["s_up"],
            "b_up": packed["b_up"],
            "w_down": packed["w_down"].data, "s_down": packed["s_down"],
            "b_down": packed["b_down"],
        })
    for n in ("wq", "wk", "wv", "wo"):
        arrs[n] = a[n].data
        arrs[n + "_scale"] = a[n + "_scale"]
        arrs[n.replace("w", "b")] = a[n.replace("w", "b")]
    specs = {
        k: P(*([None] * arrs[k].ndim)) for k in arrs
    }
    return arrs, specs


def _block_body_sp(
    d: dict,
    x_l: jax.Array,
    cfg: TernaryBlockConfig,
    s: int,
    compute_dtype,
    use_kernel: bool,
    precision,
) -> jax.Array:
    """Per-device body: everything shard-local except the KV ring."""
    bl, tl, dm = x_l.shape
    hd = cfg.attn.head_dim

    def proj(name, inp):
        return _local_spmm(
            inp.reshape(-1, inp.shape[-1]) * d[name + "_scale"],
            d[name], d[name.replace("w", "b")], None,
            compute_dtype, use_kernel, inp.shape[-1],
        )

    h = rmsnorm(x_l, d["norm1"], cfg.eps)
    q = proj("wq", h).reshape(bl, tl, cfg.attn.n_heads, hd)
    k = proj("wk", h).reshape(bl, tl, cfg.attn.kv_heads, hd)
    v = proj("wv", h).reshape(bl, tl, cfg.attn.kv_heads, hd)
    att = _ring_body(
        q, k, v, s, cfg.causal, precision,
        rope_theta=cfg.attn.rope_theta if cfg.attn.rope else None,
        window=cfg.attn.window,
    )
    x_l = x_l + proj("wo", att.reshape(bl, tl, dm)).reshape(bl, tl, dm)

    h2 = rmsnorm(x_l, d["norm2"], cfg.eps).reshape(bl * tl, dm)
    if "moe_router" in d:
        # MoE FFN: routing is per-token, so each sequence shard routes
        # its own tokens (drop-free — call-local and causal-safe); the
        # stacked expert weights are replicated like every other weight
        from smmb_tpu.formats.packed import TernaryPacked
        from smmb_tpu.models.moe import moe_forward

        mp = {
            "router": d["moe_router"],
            "w_up": TernaryPacked(
                data=d["moe_w_up"], rows=cfg.d_model, cols=cfg.d_ff, nnz=-1
            ),
            "s_up": d["moe_s_up"], "b_up": d["moe_b_up"],
            "w_down": TernaryPacked(
                data=d["moe_w_down"], rows=cfg.d_ff, cols=cfg.d_model,
                nnz=-1,
            ),
            "s_down": d["moe_s_down"], "b_down": d["moe_b_down"],
        }
        y = moe_forward(
            mp, h2, cfg.moe, compute_dtype=compute_dtype,
            use_kernel=use_kernel, no_drop=True,
        )
        return x_l + y.reshape(bl, tl, dm)
    up = _local_spmm(
        h2 * d["s_up"], d["w_up"], d["b_up"], cfg.alpha,
        compute_dtype, use_kernel, dm,
    )
    down = _local_spmm(
        up * d["s_down"], d["w_down"], d["b_down"], None,
        compute_dtype, use_kernel, cfg.d_ff,
    )
    return x_l + down.reshape(bl, tl, dm)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def block_forward_sp(
    packed: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Sequence-parallel block forward: x (B, T, d_model) with T sharded
    over ``model`` (B over ``data``); T % model-size == 0. Returns y with
    the same placement."""
    s = mesh.shape[MODEL_AXIS]
    if x.shape[1] % s:
        raise ValueError(f"T={x.shape[1]} % model={s} != 0")
    arrs, specs = _block_arrs_specs(packed)
    x_spec = P(DATA_AXIS, MODEL_AXIS, None)

    def body(d, x_l):
        return _block_body_sp(
            d, x_l, cfg, s, compute_dtype, use_kernel, precision
        )

    return jax.shard_map(
        body, mesh=mesh, in_specs=(specs, x_spec), out_specs=x_spec,
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def lm_forward_sp(
    packed: dict,
    tokens: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Sequence-parallel LM forward: (B, T) tokens, T sharded over
    ``model`` → (B, T, vocab) logits with the same T sharding.

    Embedding lookup, norms, and the LM head are per-token (XLA shards
    them from the placement constraints); each block is one shard_map
    whose only collectives are the attention ring's rotations. This is
    the long-context prefill/training-forward path — decode serves from
    models/lm.generate (a single position has no sequence to shard).
    """
    b, t = tokens.shape
    s = mesh.shape[MODEL_AXIS]
    if t % s:
        raise ValueError(f"T={t} % model={s} != 0")
    tok_spec = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    x_spec = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    tokens = jax.lax.with_sharding_constraint(tokens, tok_spec)
    x = packed["embed"][tokens] + packed["pos"][None, :t]
    x = jax.lax.with_sharding_constraint(x, x_spec)
    for blk in packed["blocks"]:
        x = block_forward_sp(
            blk, x, cfg.block, mesh=mesh,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision,
        )
    h = rmsnorm(x, packed["norm_f"], cfg.eps)

    def head_body(h_l, data_l, scale):
        y = _local_spmm(
            h_l.reshape(-1, h_l.shape[-1]), data_l, None, None,
            compute_dtype, use_kernel, cfg.d_model,
        )
        return (y * scale).reshape(h_l.shape[0], h_l.shape[1], -1)

    return jax.shard_map(
        head_body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS, None), P(None, None), P()),
        out_specs=P(DATA_AXIS, MODEL_AXIS, None),
        check_vma=False,
    )(h, packed["head"].data, packed["head_scale"])
