"""Tensor-parallel ternary transformer block over the device mesh (net-new).

Megatron-style sharding of models/transformer.py's pre-norm block, built on
the packed-plane partitioners in parallel/sharded.py:

* Q/K/V projections **column-parallel** — each model-shard owns
  ``n_heads / model`` whole heads, so the attention math (scores, softmax,
  weighted sum) runs shard-locally with no collective.
* out-projection **row-parallel** — its contraction axis is the head
  feature axis the shards already own; partials ``psum`` over ICI.
* MLP up **column-parallel** (PReLU applied shard-locally — elementwise on
  owned columns), down **row-parallel** closing with the second ``psum``.

Two ``psum``s per block total — the textbook TP count. The whole block is
one ``shard_map`` whose per-device body is the unchanged single-chip packed
Pallas kernel, mirroring parallel/sharded.py.

The reference has no distributed layer (SURVEY.md §2 checklist); this is the
BASELINE.json north-star direction applied to the transformer family, the
analog of mlp.mlp_forward_sharded's Megatron pairing.

Sharding constraints (all enforced by the partitioners / asserts here):
``n_heads % model == 0``; ``d_model % (128·model) == 0`` for the QKV column
shards; ``d_model`` and ``d_ff`` multiples of ``512·model`` for the two
row-sharded contractions (packed-group alignment).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.models.attention import _attention_math
from smmb_tpu.models.transformer import TernaryBlockConfig, rmsnorm
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from smmb_tpu.parallel.sharded import (
    _local_spmm,
    shard_packed_columns,
    shard_packed_rows,
)


def _model_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def shard_block_tp(packed: dict, mesh: Mesh) -> dict:
    """Place one packed block (models/transformer.pack_block) on the mesh.

    QKV + MLP-up planes column-sharded, out-proj + MLP-down row-sharded;
    column-layer biases follow their columns, row-layer biases and the
    norm gains replicate.
    """
    a = packed["attn"]
    col_b = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())
    repl1 = NamedSharding(mesh, P(None))

    attn = {}
    for name in ("wq", "wk", "wv"):
        attn[name] = shard_packed_columns(a[name], mesh)
        attn[name + "_scale"] = jax.device_put(a[name + "_scale"], repl)
        attn[name.replace("w", "b")] = jax.device_put(
            a[name.replace("w", "b")], col_b
        )
    attn["wo"] = shard_packed_rows(a["wo"], mesh)
    attn["wo_scale"] = jax.device_put(a["wo_scale"], repl)
    attn["bo"] = jax.device_put(a["bo"], repl1)

    return {
        "attn": attn,
        "w_up": shard_packed_columns(packed["w_up"], mesh),
        "s_up": jax.device_put(packed["s_up"], repl),
        "b_up": jax.device_put(packed["b_up"], col_b),
        "w_down": shard_packed_rows(packed["w_down"], mesh),
        "s_down": jax.device_put(packed["s_down"], repl),
        "b_down": jax.device_put(packed["b_down"], repl1),
        "norm1": jax.device_put(packed["norm1"], repl1),
        "norm2": jax.device_put(packed["norm2"], repl1),
    }


def _block_arrs_specs(packed: dict):
    """Flatten a (sharded) packed block into (arrays, shard_map specs)."""
    a = packed["attn"]
    arrs = {
        "wq": a["wq"].data, "wk": a["wk"].data, "wv": a["wv"].data,
        "wo": a["wo"].data,
        "sq": a["wq_scale"], "sk": a["wk_scale"], "sv": a["wv_scale"],
        "so": a["wo_scale"],
        "bq": a["bq"], "bk": a["bk"], "bv": a["bv"], "bo": a["bo"],
        "w_up": packed["w_up"].data, "w_down": packed["w_down"].data,
        "s_up": packed["s_up"], "s_down": packed["s_down"],
        "b_up": packed["b_up"], "b_down": packed["b_down"],
        "norm1": packed["norm1"], "norm2": packed["norm2"],
    }
    col_w, row_w = P(None, MODEL_AXIS), P(MODEL_AXIS, None)
    specs = {
        "wq": col_w, "wk": col_w, "wv": col_w, "wo": row_w,
        "sq": P(), "sk": P(), "sv": P(), "so": P(),
        "bq": P(MODEL_AXIS), "bk": P(MODEL_AXIS), "bv": P(MODEL_AXIS),
        "bo": P(None),
        "w_up": col_w, "w_down": row_w,
        "s_up": P(), "s_down": P(),
        "b_up": P(MODEL_AXIS), "b_down": P(None),
        "norm1": P(None), "norm2": P(None),
    }
    return arrs, specs


def _block_body_tp(
    d: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    ms: int,
    compute_dtype,
    use_kernel: bool,
    precision,
) -> jax.Array:
    """Per-device block body (runs inside shard_map): local heads + 2 psums."""
    bl, t, dm = x.shape
    d_loc = dm // ms
    lcfg = dataclasses.replace(
        cfg.attn, d_model=d_loc, n_heads=cfg.attn.n_heads // ms
    )

    def col(inp, w, bias, scale, alpha=None, rows=dm):
        # column-parallel: full-K contraction onto owned output columns
        return _local_spmm(
            inp * scale, w, bias, alpha, compute_dtype, use_kernel, rows
        )

    def row(inp, w, scale, rows):
        # row-parallel partial: owned-K contraction, bias/epilogue deferred
        # until after the cross-shard reduction
        return _local_spmm(
            inp * scale, w, None, None, compute_dtype, use_kernel, rows
        )

    h = rmsnorm(x, d["norm1"], cfg.eps).reshape(bl * t, dm)
    q = col(h, d["wq"], d["bq"], d["sq"]).reshape(bl, t, d_loc)
    k = col(h, d["wk"], d["bk"], d["sk"]).reshape(bl, t, d_loc)
    v = col(h, d["wv"], d["bv"], d["sv"]).reshape(bl, t, d_loc)
    att = _attention_math(q, k, v, lcfg, precision=precision)
    part = row(att.reshape(bl * t, d_loc), d["wo"], d["so"], rows=d_loc)
    att_out = jax.lax.psum(part, MODEL_AXIS) + d["bo"]
    x = x + att_out.reshape(bl, t, dm)

    h2 = rmsnorm(x, d["norm2"], cfg.eps).reshape(bl * t, dm)
    up = col(h2, d["w_up"], d["b_up"], d["s_up"], alpha=cfg.alpha)
    part = row(up, d["w_down"], d["s_down"], rows=cfg.d_ff // ms)
    down = jax.lax.psum(part, MODEL_AXIS) + d["b_down"]
    return x + down.reshape(bl, t, dm)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def block_forward_tp(
    packed: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Tensor-parallel block forward: x (B, T, d_model) batch-sharded over
    ``data``, replicated over ``model``; returns y with the same placement.
    """
    ms = _model_size(mesh)
    if cfg.attn.n_heads % ms:
        raise ValueError(f"n_heads={cfg.attn.n_heads} % model={ms} != 0")
    arrs, specs = _block_arrs_specs(packed)

    def body(d, x_l):
        return _block_body_tp(
            d, x_l, cfg, ms, compute_dtype, use_kernel, precision
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)


# ---------------------------------------------------------------------------
# LM-level tensor parallelism
# ---------------------------------------------------------------------------


def shard_lm_tp(packed: dict, mesh: Mesh) -> dict:
    """Place a packed LM (models/lm.pack_lm) on the mesh: every block TP-
    sharded, LM head column-sharded (vocab split), embeddings replicated."""
    repl1 = NamedSharding(mesh, P(None))
    repl2 = NamedSharding(mesh, P(None, None))
    return {
        "embed": jax.device_put(packed["embed"], repl2),
        "pos": jax.device_put(packed["pos"], repl2),
        "blocks": [shard_block_tp(b, mesh) for b in packed["blocks"]],
        "norm_f": jax.device_put(packed["norm_f"], repl1),
        "head": shard_packed_columns(packed["head"], mesh),
        "head_scale": jax.device_put(
            packed["head_scale"], NamedSharding(mesh, P())
        ),
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def lm_forward_tp(
    packed: dict,
    tokens: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Tensor-parallel LM forward: (B, T) tokens batch-sharded over ``data``
    → (B, T, vocab) logits, vocab gathered back to replicated.

    Embedding lookup and norms run data-parallel under jit (XLA shards
    them from the input placement); each block is one shard_map with two
    psums; the head's vocab shards all-gather at the end.
    """
    b, t = tokens.shape
    x = packed["embed"][tokens] + packed["pos"][None, :t]
    for blk in packed["blocks"]:
        x = block_forward_tp(
            blk, x, cfg.block, mesh=mesh,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision,
        )
    h = rmsnorm(x, packed["norm_f"], cfg.eps)

    def head_body(h_l, data_l, scale):
        y = _local_spmm(
            h_l.reshape(-1, h_l.shape[-1]),
            data_l, None, None, compute_dtype, use_kernel, cfg.d_model,
        )
        return (y * scale).reshape(h_l.shape[0], h_l.shape[1], -1)

    logits = jax.shard_map(
        head_body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(None, MODEL_AXIS), P()),
        out_specs=P(DATA_AXIS, None, MODEL_AXIS),
        check_vma=False,
    )(h, packed["head"].data, packed["head_scale"])
    # gather the vocab shards so the caller sees replicated logits
    return jax.lax.with_sharding_constraint(
        logits, NamedSharding(mesh, P(DATA_AXIS, None, None))
    )
