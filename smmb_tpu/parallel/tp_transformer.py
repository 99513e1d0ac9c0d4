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

from smmb_tpu.models.attention import (
    _attention_math,
    _cache_kv,
    _cache_write,
    _decode_attention_math,
    apply_rope,
)
from smmb_tpu.models.transformer import TernaryBlockConfig, rmsnorm
from smmb_tpu.ops.dense import prelu
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
    _reject_lora(packed)
    col_b = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())
    repl1 = NamedSharding(mesh, P(None))

    out = {
        "attn": shard_attn_megatron(packed["attn"], mesh),
        "w_up": shard_packed_columns(packed["w_up"], mesh),
        "s_up": jax.device_put(packed["s_up"], repl),
        "b_up": jax.device_put(packed["b_up"], col_b),
        "w_down": shard_packed_rows(packed["w_down"], mesh),
        "s_down": jax.device_put(packed["s_down"], repl),
        "b_down": jax.device_put(packed["b_down"], repl1),
        "norm1": jax.device_put(packed["norm1"], repl1),
        "norm2": jax.device_put(packed["norm2"], repl1),
    }
    _shard_lora_entries(packed, out, mesh)
    return out


def shard_attn_megatron(a: dict, mesh: Mesh) -> dict:
    """Megatron placement for one packed attention dict: column QKV
    (biases follow their columns), row out-proj (bias replicated).
    Shared by the dense TP block and the TP-EP MoE block."""
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
    _shard_lora_entries(a, attn, mesh)
    return attn


def _shard_lora_entries(src: dict, dst: dict, mesh: Mesh) -> None:
    """Place any ``*_lora`` (A, B, scale) entries of ``src`` into ``dst``
    with their TP shardings (_lora_spec): column-parallel base → B
    column-split; row-parallel base → A row-split."""
    for k, v in src.items():
        if k.endswith("_lora"):
            dst[k] = tuple(
                jax.device_put(arr, NamedSharding(mesh, sp))
                for arr, sp in zip(v, _lora_spec(k))
            )


def _reject_lora(packed: dict) -> None:
    """MoE blocks are refused from the dense TP path with a pointer
    rather than a KeyError. (LoRA adapters ARE carried — see
    _lora_arrs_specs — sharded A-replicated/B-column-split on column
    layers and A-row-split/B-replicated on row layers.)"""
    if "moe" in packed:
        raise ValueError(
            "MoE blocks do not use the dense tensor-parallel path — use "
            "parallel/tp_moe.py (Megatron attention + expert-parallel FFN:"
            " forward/prefill/decode), which the LM-level TP entry points "
            "dispatch to automatically via _tp_block_fns"
        )


# LoRA placement per adapted layer kind (models/lora.py attaches
# ``(A (d_in, r), B (r, d_out), scale)`` tuples as ``<name>_lora``):
# column-parallel base (wq/wk/wv/w_up) → B's output columns follow the
# base columns, A replicated; row-parallel base (wo/w_down) → A's input
# rows follow the base rows (the shard's x slice is the matching
# contraction slice), B replicated, and the adapter partial rides the
# base's existing psum. Either way the adapter adds zero collectives.
_LORA_COL = ("wq", "wk", "wv", "w_up")
_LORA_ROW = ("wo", "w_down")


def _lora_spec(name: str):
    base = name[: -len("_lora")]
    if base in _LORA_COL:
        return (P(None, None), P(None, MODEL_AXIS), P())
    assert base in _LORA_ROW, name
    return (P(MODEL_AXIS, None), P(None, None), P())


def _lora_arrs_specs(src: dict, arrs: dict, specs: dict) -> None:
    """Carry any ``*_lora`` entries of ``src`` into the flattened
    (arrays, shard_map specs) dicts."""
    for k, v in src.items():
        if k.endswith("_lora"):
            arrs[k] = v
            specs[k] = _lora_spec(k)


def _lora_add(d: dict, name: str, raw, y):
    """Add the (shard-local) low-rank residual for layer ``name`` if an
    adapter is attached: y += scale · (raw A) B. ``raw`` is the layer
    input BEFORE the quantization scale (models/attention._proj's
    contract). On row-parallel layers the result is a partial that the
    caller's psum completes."""
    la = d.get(name + "_lora")
    if la is None:
        return y
    a, b, sc = la
    return y + jnp.matmul(jnp.matmul(raw, a), b) * sc


def _block_arrs_specs(packed: dict):
    """Flatten a (sharded) packed block into (arrays, shard_map specs);
    ``*_lora`` adapter entries are carried with their own specs."""
    _reject_lora(packed)
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
    _lora_arrs_specs(a, arrs, specs)
    _lora_arrs_specs(packed, arrs, specs)
    return arrs, specs


def attn_half_tp(
    d: dict,
    x: jax.Array,
    attn_cfg,
    eps: float,
    ms: int,
    compute_dtype,
    use_kernel: bool,
    precision,
    qkv=None,
    use_flash: bool = False,
    valid=None,
) -> jax.Array:
    """Shared Megatron attention half (inside shard_map): local heads,
    row out-proj, ONE psum; returns ``x + attention``. Used by the dense
    TP block and the TP-EP MoE block (parallel/tp_moe.py).

    ``qkv`` lets a prefill body pass in the projections it already
    computed for the cache fill (as (B, T, H_local, hd) triples) instead
    of paying the three column SpMMs twice. ``valid`` (B_local, T) marks
    real tokens of a LEFT-padded ragged batch (round 5, VERDICT r4 #2)."""
    bl, t, dm = x.shape
    d_loc = dm // ms
    h_loc = attn_cfg.n_heads // ms
    kvh_loc = attn_cfg.kv_heads // ms
    lcfg = dataclasses.replace(
        attn_cfg, d_model=d_loc, n_heads=h_loc, n_kv_heads=kvh_loc
    )
    if qkv is None:
        h = rmsnorm(x, d["norm1"], eps).reshape(bl * t, dm)
        qkv = _qkv_local(
            d, h, bl, t, h_loc, kvh_loc, attn_cfg.head_dim,
            compute_dtype, use_kernel, dm,
        )
    # merge heads back: _attention_math re-splits via lcfg (q at d_loc,
    # k/v at the local kv width)
    q, k, v = (a.reshape(bl, t, -1) for a in qkv)
    att = _attention_math(
        q, k, v, lcfg, precision=precision,
        use_flash=use_flash and valid is None, valid=valid,
    )
    att_flat = att.reshape(bl * t, d_loc)
    part = _local_spmm(
        att_flat * d["so"], d["wo"], None, None,
        compute_dtype, use_kernel, d_loc,
    )
    # row-parallel LoRA: A row-split (the shard's att slice is the
    # matching contraction slice), partial rides the existing psum
    part = _lora_add(d, "wo", att_flat, part)
    att_out = jax.lax.psum(part, MODEL_AXIS) + d["bo"]
    return x + att_out.reshape(bl, t, dm)


def _block_body_tp(
    d: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    ms: int,
    compute_dtype,
    use_kernel: bool,
    precision,
    qkv=None,
    use_flash: bool = False,
    valid=None,
) -> jax.Array:
    """Per-device block body (runs inside shard_map): local heads + 2 psums."""
    bl, t, dm = x.shape
    x = attn_half_tp(
        d, x, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel, precision,
        qkv=qkv, use_flash=use_flash, valid=valid,
    )
    h2 = rmsnorm(x, d["norm2"], cfg.eps).reshape(bl * t, dm)
    part = _mlp_half_tp(d, h2, cfg, ms, compute_dtype, use_kernel)
    down = jax.lax.psum(part, MODEL_AXIS) + d["b_down"]
    return x + down.reshape(bl, t, dm)


def _mlp_half_tp(d, h2, cfg, ms, compute_dtype, use_kernel):
    """Shard-local MLP half on flattened (rows, d_model) input; returns
    the pre-psum down-projection partial (bias added after the psum).

    When a ``w_up_lora`` adapter is attached the PReLU epilogue cannot
    stay fused in the base spmm (the residual adds pre-activation —
    models/transformer._mlp_half's rule); the base then runs
    epilogue-free and PReLU is applied after the add."""
    dm = h2.shape[-1]
    if d.get("w_up_lora") is None:
        up = _local_spmm(
            h2 * d["s_up"], d["w_up"], d["b_up"], cfg.alpha,
            compute_dtype, use_kernel, dm,
        )
    else:
        pre = _local_spmm(
            h2 * d["s_up"], d["w_up"], d["b_up"], None,
            compute_dtype, use_kernel, dm,
        )
        up = prelu(_lora_add(d, "w_up", h2, pre), cfg.alpha)
    part = _local_spmm(
        up * d["s_down"], d["w_down"], None, None,
        compute_dtype, use_kernel, cfg.d_ff // ms,
    )
    return _lora_add(d, "w_down", up, part)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "compute_dtype", "use_kernel", "precision", "use_flash"
    ),
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
    use_flash: bool = False,
) -> jax.Array:
    """Tensor-parallel block forward: x (B, T, d_model) batch-sharded over
    ``data``, replicated over ``model``; returns y with the same placement.
    """
    ms = _model_size(mesh)
    if cfg.attn.n_heads % ms:
        raise ValueError(f"n_heads={cfg.attn.n_heads} % model={ms} != 0")
    if cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_kv_heads={cfg.attn.kv_heads} % model={ms} != 0"
        )
    arrs, specs = _block_arrs_specs(packed)

    def body(d, x_l):
        return _block_body_tp(
            d, x_l, cfg, ms, compute_dtype, use_kernel, precision,
            use_flash=use_flash,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)


# ---------------------------------------------------------------------------
# Tensor-parallel serving decode (head-sharded KV caches)
# ---------------------------------------------------------------------------


def init_block_cache_tp(
    cfg: TernaryBlockConfig,
    batch: int,
    max_len: int,
    mesh: Mesh,
    dtype=jnp.float32,
    quantized: bool = False,
    ragged: bool = False,
) -> dict:
    """KV cache for one TP block: (B, max_len, H, hd) sharded over the
    model axis on the *heads* dim — each shard caches only the heads it
    owns, so decode attention stays collective-free. ``quantized=True``
    stores int8 codes + per-(token, head) absmax scales, sharded like the
    codes (see models/attention.init_kv_cache) — decode cache reads are
    the TP serving bottleneck and shrink 4×/2× vs f32/bf16."""
    ms = _model_size(mesh)
    if cfg.attn.n_heads % ms or cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_heads={cfg.attn.n_heads}/n_kv_heads={cfg.attn.kv_heads} "
            f"must divide model={ms}"
        )
    # flat serving layout (B, S, KVH_total·hd) sharded on head-group
    # boundaries of the fused last axis (models/attention.init_kv_cache
    # rationale) — each shard's local view is its own flat head range
    sh = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))
    pos_sh = NamedSharding(mesh, P())
    if quantized:
        # merged interleaved int8 layout (models/attention.init_kv_cache
        # round 5): the per-head [k|v] pair interleave keeps each head's
        # planes adjacent, so a contiguous lane-axis shard owns complete
        # (k, v) pairs for its KVH/ms heads — head sharding survives the
        # merge. Scales (B, 2·KVH, S) shard the interleaved head axis.
        shape = (batch, max_len, 2 * cfg.attn.kv_heads * cfg.attn.head_dim)
        sshape = (batch, 2 * cfg.attn.kv_heads, max_len)
        ssh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
        cache = {
            "kv": jax.device_put(jnp.zeros(shape, jnp.int8), sh),
            "kv_scale": jax.device_put(jnp.zeros(sshape, jnp.float32), ssh),
            "pos": jax.device_put(jnp.int32(0), pos_sh),
        }
    else:
        shape = (batch, max_len, cfg.attn.kv_heads * cfg.attn.head_dim)
        cache = {
            "k": jax.device_put(jnp.zeros(shape, dtype), sh),
            "v": jax.device_put(jnp.zeros(shape, dtype), sh),
            "pos": jax.device_put(jnp.int32(0), pos_sh),
        }
    if ragged:
        # per-row real-token mask, batch-sharded and replicated over model
        cache["valid"] = jax.device_put(
            jnp.zeros((batch, max_len), bool),
            NamedSharding(mesh, P(DATA_AXIS, None)),
        )
    return cache


_KV_SPEC = P(DATA_AXIS, None, MODEL_AXIS)
_SCALE_SPEC = P(DATA_AXIS, MODEL_AXIS, None)


def _cache_specs(cache: dict) -> dict:
    """Per-leaf shard_map specs for a TP cache dict (scales follow the
    codes' head sharding on their own (B, 2·KVH, S) layout; ``pos``
    replicates)."""
    return {
        k: (
            P()
            if k == "pos"
            else P(DATA_AXIS, None)
            if k == "valid"
            else _SCALE_SPEC if k.endswith("_scale") else _KV_SPEC
        )
        for k in cache
    }


def _qkv_local(
    d, h2, bl, t, h_loc, kvh_loc, hd, compute_dtype, use_kernel, dm
):
    """Shard-local Q/K/V projections: Q → (B, T, H_local, hd), K/V →
    (B, T, KVH_local, hd). Under GQA each shard's query heads group over
    exactly its own KV heads (head j reads kv j//G, and contiguous
    head-range shards preserve that mapping), so attention stays local."""

    def col(name, heads):
        y = _local_spmm(
            h2 * d["s" + name[1:]], d[name], d["b" + name[1:]], None,
            compute_dtype, use_kernel, dm,
        )
        # column-parallel LoRA: A replicated, B column-split — the
        # shard-local residual lands exactly on the local output slice
        return _lora_add(d, name, h2, y).reshape(bl, t, heads, hd)

    return (col("wq", h_loc), col("wk", kvh_loc), col("wv", kvh_loc))


def attn_decode_half_tp(
    d, x_t, cache, attn_cfg, eps, ms, compute_dtype, use_kernel, precision
):
    """Shared Megatron attention *decode* half (inside shard_map):
    shard-local cache write + local-head cache attention + row out-proj,
    ONE psum; returns ``(x + attention, cache)``. ``cache`` is the
    shard-local dict view; the write/read helpers from models/attention
    handle the plain and int8-quantized layouts alike. Used by the dense
    TP decode body and the TP-EP MoE decode body (parallel/tp_moe.py)."""
    bl, one, dm = x_t.shape
    h_loc = attn_cfg.n_heads // ms
    kvh_loc = attn_cfg.kv_heads // ms
    hd = attn_cfg.head_dim
    pos = cache["pos"]

    h = rmsnorm(x_t, d["norm1"], eps).reshape(bl, dm)
    q, k, v = _qkv_local(
        d, h, bl, one, h_loc, kvh_loc, hd, compute_dtype, use_kernel, dm
    )
    if attn_cfg.rope:
        q = apply_rope(q, pos + jnp.arange(1), attn_cfg.rope_theta)
        k = apply_rope(k, pos + jnp.arange(1), attn_cfg.rope_theta)
    cache = _cache_write(cache, k, v, pos)
    kc, vc = _cache_kv(cache, kvh_loc)
    att = _decode_attention_math(
        q, kc, vc, pos, hd, precision=precision, window=attn_cfg.window,
        valid=cache.get("valid"),
    )
    att_flat = att.reshape(bl, h_loc * hd)
    part = _local_spmm(
        att_flat * d["so"], d["wo"], None, None,
        compute_dtype, use_kernel, dm // ms,
    )
    part = _lora_add(d, "wo", att_flat, part)
    att_out = jax.lax.psum(part, MODEL_AXIS) + d["bo"]
    return x_t + att_out.reshape(bl, one, dm), cache


def _block_decode_body_tp(
    d, x_t, cache, cfg, ms, compute_dtype, use_kernel, precision
):
    """Per-device decode body: local-head cache attention + 2 psums."""
    bl, one, dm = x_t.shape
    x, cache = attn_decode_half_tp(
        d, x_t, cache, cfg.attn, cfg.eps, ms, compute_dtype, use_kernel,
        precision,
    )
    h2 = rmsnorm(x, d["norm2"], cfg.eps).reshape(bl, dm)
    part = _mlp_half_tp(d, h2, cfg, ms, compute_dtype, use_kernel)
    down = jax.lax.psum(part, MODEL_AXIS) + d["b_down"]
    return x + down.reshape(bl, one, dm), cache


def block_decode_step_tp(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> tuple[jax.Array, dict]:
    """One TP serving decode step: x_t (B, 1, d_model) replicated over
    ``model``; the KV cache stays head-sharded throughout (no cache
    collectives — only the block's two output psums)."""
    ms = _model_size(mesh)
    if cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_kv_heads={cfg.attn.kv_heads} % model={ms} != 0"
        )
    arrs, specs = _block_arrs_specs(packed)
    cspecs = _cache_specs(cache)

    def body(d, x_l, c):
        return _block_decode_body_tp(
            d, x_l, c, cfg, ms, compute_dtype, use_kernel, precision
        )

    y, cache = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None), cspecs),
        out_specs=(P(DATA_AXIS, None, None), cspecs),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x_t, cache)
    return y, cache


def block_prefill_tp(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryBlockConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    valid=None,
) -> tuple[jax.Array, dict]:
    """TP prompt pass: full block forward + head-sharded cache fill.
    ``valid`` (B, T) marks real tokens of a LEFT-padded ragged batch —
    pad slots are written but marked invalid in the ragged TP cache
    (requires init_block_cache_tp(ragged=True))."""
    ms = _model_size(mesh)
    if cfg.attn.kv_heads % ms:
        raise ValueError(
            f"n_kv_heads={cfg.attn.kv_heads} % model={ms} != 0"
        )
    arrs, specs = _block_arrs_specs(packed)
    cspecs = _cache_specs(cache)

    def body(d, x_l, c, valid_l):
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
        c = _cache_write(c, k_cache, v, pos, valid=valid_l)
        # reuse the cache-fill projections for the forward itself
        y = _block_body_tp(
            d, x_l, cfg, ms, compute_dtype, use_kernel, precision,
            qkv=(q, k, v), use_flash=use_flash, valid=valid_l,
        )
        return y, c

    if valid is None:
        body2 = lambda d, x_l, c: body(d, x_l, c, None)  # noqa: E731
        y, cache = jax.shard_map(
            body2,
            mesh=mesh,
            in_specs=(specs, P(DATA_AXIS, None, None), cspecs),
            out_specs=(P(DATA_AXIS, None, None), cspecs),
            check_vma=False,
        )(arrs, x, cache)
    else:
        y, cache = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                specs, P(DATA_AXIS, None, None), cspecs, P(DATA_AXIS, None)
            ),
            out_specs=(P(DATA_AXIS, None, None), cspecs),
            check_vma=False,
        )(arrs, x, cache, valid)
    return y, cache


# ---------------------------------------------------------------------------
# LM-level tensor parallelism
# ---------------------------------------------------------------------------


def _tp_block_fns(packed_block: dict) -> dict:
    """TP block-function table keyed on the packed dict's kind: dense
    (this module — Megatron) or MoE (parallel/tp_moe.py — Megatron
    attention + expert-parallel FFN). The TP analog of
    models/lm.TernaryLMConfig._blk: this one indirection lets the whole
    TP serving stack (lm forward/prefill/decode/generate_tp) run MoE LMs
    unchanged. Lazy import — tp_moe imports this module."""
    if "moe" in packed_block:
        from smmb_tpu.parallel import tp_moe as m

        return {
            "shard": m.shard_moe_block_tp,
            "forward": m.moe_block_forward_tp,
            "prefill": m.moe_block_prefill_tp,
            "decode": m.moe_block_decode_step_tp,
        }
    return {
        "shard": shard_block_tp,
        "forward": block_forward_tp,
        "prefill": block_prefill_tp,
        "decode": block_decode_step_tp,
    }


def shard_lm_tp(packed: dict, mesh: Mesh) -> dict:
    """Place a packed LM (models/lm.pack_lm) on the mesh: every block TP-
    sharded (dense Megatron or TP-EP MoE, keyed per block), LM head
    column-sharded (vocab split), embeddings replicated."""
    repl1 = NamedSharding(mesh, P(None))
    repl2 = NamedSharding(mesh, P(None, None))
    return {
        "embed": jax.device_put(packed["embed"], repl2),
        "pos": jax.device_put(packed["pos"], repl2),
        "blocks": [
            _tp_block_fns(b)["shard"](b, mesh) for b in packed["blocks"]
        ],
        "norm_f": jax.device_put(packed["norm_f"], repl1),
        "head": shard_packed_columns(packed["head"], mesh),
        "head_scale": jax.device_put(
            packed["head_scale"], NamedSharding(mesh, P())
        ),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "compute_dtype", "use_kernel", "precision", "use_flash"
    ),
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
    use_flash: bool = False,
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
        x = _tp_block_fns(blk)["forward"](
            blk, x, cfg.block, mesh=mesh,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash,
        )
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    return _head_logits_tp(
        packed, h, cfg, mesh, compute_dtype, use_kernel
    )


def _head_logits_tp(packed, h, cfg, mesh, compute_dtype, use_kernel):
    """Vocab-sharded LM head: local column SpMM, then gather the shards so
    the caller sees replicated logits."""

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
    return jax.lax.with_sharding_constraint(
        logits, NamedSharding(mesh, P(DATA_AXIS, None, None))
    )


def lm_init_cache_tp(
    cfg, batch: int, mesh: Mesh, dtype=jnp.float32, quantized: bool = False,
    ragged: bool = False,
) -> list:
    """Head-sharded KV caches for every block of a TP LM."""
    return [
        init_block_cache_tp(
            cfg.block, batch, cfg.max_len, mesh, dtype=dtype,
            quantized=quantized, ragged=ragged,
        )
        for _ in range(cfg.n_layers)
    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "compute_dtype", "use_kernel", "precision", "use_flash"
    ),
)
def lm_prefill_tp(
    packed: dict,
    tokens: jax.Array,
    cache: list,
    cfg,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    prompt_mask=None,
):
    """TP prompt pass: (last-position logits (B, vocab), filled TP cache).
    ``prompt_mask`` (B, T) bool marks real tokens of a LEFT-padded ragged
    batch (requires a ragged TP cache; dense blocks only)."""
    b, t = tokens.shape
    if prompt_mask is None:
        x = packed["embed"][tokens] + packed["pos"][None, :t]
    else:
        pos_ids = jnp.clip(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0
        )
        x = packed["embed"][tokens] + packed["pos"][pos_ids]
    new_cache = []
    for blk, c in zip(packed["blocks"], cache):
        fns = _tp_block_fns(blk)
        kw2 = {} if prompt_mask is None else {"valid": prompt_mask}
        if prompt_mask is not None and "moe" in blk:
            raise ValueError(
                "ragged prompt_mask is supported for dense TP blocks only"
            )
        x, c = fns["prefill"](
            blk, x, c, cfg.block, mesh=mesh,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash, **kw2,
        )
        new_cache.append(c)
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    logits = _head_logits_tp(packed, h, cfg, mesh, compute_dtype, use_kernel)
    return logits[:, -1], new_cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def lm_decode_step_tp(
    packed: dict,
    token_t: jax.Array,
    cache: list,
    cfg,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    pos_ids=None,
):
    """One TP decode step: (B,) tokens → ((B, vocab) logits, TP cache).
    ``pos_ids`` (B,) overrides the learned-positional-embedding index per
    row (ragged batches: logical position trails the buffer index)."""
    pos = cache[0]["pos"]
    if pos_ids is None:
        pe = packed["pos"][pos][None, None]
    else:
        pe = packed["pos"][pos_ids][:, None]
    x = packed["embed"][token_t][:, None, :] + pe
    new_cache = []
    for blk, c in zip(packed["blocks"], cache):
        x, c = _tp_block_fns(blk)["decode"](
            blk, x, c, cfg.block, mesh=mesh,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision,
        )
        new_cache.append(c)
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    logits = _head_logits_tp(packed, h, cfg, mesh, compute_dtype, use_kernel)
    return logits[:, 0], new_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "steps", "mesh", "compute_dtype", "use_kernel", "precision",
        "use_flash", "kv_quant",
    ),
)
def generate_tp(
    packed: dict,
    prompt: jax.Array,
    cfg,
    steps: int,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    kv_quant: bool = False,
    prompt_mask: jax.Array | None = None,
) -> jax.Array:
    """TP greedy generation: one jitted prefill + ``lax.scan`` of TP decode
    steps, KV caches head-sharded throughout (models/lm.generate over the
    mesh). ``use_flash`` applies to the prefill only (decode reads the
    cache; it has no T×T scores).

    ``prompt_mask`` (B, T) bool serves a RAGGED batch under TP (round 5,
    VERDICT r4 #2): left-pad each prompt, mark real tokens; pad slots stay
    masked out of every row's attention and logical positions are tracked
    per row. Dense blocks only (the TP-EP MoE body stays aligned)."""
    if prompt.shape[1] + steps > cfg.max_len:
        # cache writes clamp at max_len and would silently corrupt
        raise ValueError(
            f"prompt_len={prompt.shape[1]} + steps={steps} exceeds "
            f"max_len={cfg.max_len}"
        )
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision,
    )
    # cache follows the serving dtype (halves decode cache traffic in
    # bf16); kv_quant stores int8 codes + absmax scales instead (4x less)
    cache = lm_init_cache_tp(
        cfg, prompt.shape[0], mesh, dtype=compute_dtype, quantized=kv_quant,
        ragged=prompt_mask is not None,
    )
    logits, cache = lm_prefill_tp(
        packed, prompt, cache, cfg, mesh=mesh, use_flash=use_flash,
        prompt_mask=prompt_mask, **kw
    )
    tok0 = jnp.argmax(logits, axis=-1)
    if prompt_mask is not None:
        # per-row logical length (pad rows trail the buffer position)
        llen0 = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
    else:
        llen0 = None

    def step(carry, _):
        tok, cache, llen = carry
        logits, cache = lm_decode_step_tp(
            packed, tok, cache, cfg, mesh=mesh,
            pos_ids=llen, **kw
        )
        nxt = jnp.argmax(logits, axis=-1)
        if llen is not None:
            llen = llen + 1
        return (nxt, cache, llen), tok

    (_, _, _), toks = jax.lax.scan(
        step, (tok0, cache, llen0), None, length=steps
    )
    return jnp.moveaxis(toks, 0, 1)
