"""Ternary transformer block: attention + MLP with residuals and RMSNorm.

Completes the serving stack for ternary-weight transformer models: every
matmul weight (QKV/out projections, MLP up/down) lives in the 2-bit packed
format; norms and residuals are tiny elementwise work XLA fuses for free.
RMSNorm (not LayerNorm) matches what ternary-LLM recipes train with.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.formats.packed import pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _attention_math,
    attention_decode_step,
    attention_extend,
    attention_forward,
    attention_prefill,
    init_attention,
    init_kv_cache,
    pack_attention,
)
from smmb_tpu.models.train import absmean_scale, ternarize_ste
from smmb_tpu.ops.dense import prelu
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class TernaryBlockConfig:
    d_model: int
    n_heads: int
    d_ff: int
    alpha: float = 0.2  # PReLU slope in the MLP
    causal: bool = True
    non_zero: int = 2
    eps: float = 1e-6
    n_kv_heads: int | None = None  # grouped-query attention; None = MHA
    rope: bool = False  # rotary position embeddings on Q/K
    rope_theta: float = 10000.0
    window: int | None = None  # sliding-window attention; None = full causal

    @property
    def attn(self) -> TernaryAttentionConfig:
        return TernaryAttentionConfig(
            d_model=self.d_model,
            n_heads=self.n_heads,
            causal=self.causal,
            non_zero=self.non_zero,
            n_kv_heads=self.n_kv_heads,
            rope=self.rope,
            rope_theta=self.rope_theta,
            window=self.window,
        )


def rmsnorm(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * g


def init_block(key: jax.Array, cfg: TernaryBlockConfig) -> dict:
    ka, k1, k2, kb1, kb2 = jax.random.split(key, 5)
    params = {
        "attn": init_attention(ka, cfg.attn),
        "w_up": rng.rand_ternary(
            k1, (cfg.d_model, cfg.d_ff), non_zero=cfg.non_zero
        ),
        "b_up": rng.rand_dense(kb1, (cfg.d_ff,)),
        "w_down": rng.rand_ternary(
            k2, (cfg.d_ff, cfg.d_model), non_zero=cfg.non_zero
        ),
        "b_down": rng.rand_dense(kb2, (cfg.d_model,)),
        "norm1": jnp.ones((cfg.d_model,)),
        "norm2": jnp.ones((cfg.d_model,)),
    }
    return params


def pack_block(params: dict, quantize: bool = False) -> dict:
    """Masters → packed serving block (see pack_mlp for quantize semantics)."""

    def one(wname):
        w = params[wname]
        if quantize:
            return pack_ternary_device(ternarize_ste(w)), absmean_scale(w)
        return pack_ternary_device(w), jnp.float32(1.0)

    w_up, s_up = one("w_up")
    w_down, s_down = one("w_down")
    return {
        "attn": pack_attention(params["attn"], quantize=quantize),
        "w_up": w_up,
        "s_up": s_up,
        "b_up": params["b_up"],
        "w_down": w_down,
        "s_down": s_down,
        "b_down": params["b_down"],
        "norm1": params["norm1"],
        "norm2": params["norm2"],
    }


def block_forward(
    packed: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> jax.Array:
    """Pre-norm transformer block: x + attn(norm(x)), then x + mlp(norm(x)).

    ``precision`` reaches the attention einsums only (the packed SpMM
    decode-and-dot is exact by construction); pass HIGHEST for
    decode-vs-full parity checks. ``use_flash`` selects the Pallas
    online-softmax attention kernel (long-context prefill).
    """
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    x = x + attention_forward(
        packed["attn"], h, cfg.attn,
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    return _mlp_half(packed, x, cfg, _make_spmm(compute_dtype, use_kernel), compute_dtype, use_kernel)


def init_block_cache(
    cfg: TernaryBlockConfig,
    batch: int,
    max_len: int,
    dtype=jnp.float32,
    quantized: bool = False,
    ragged: bool = False,
) -> dict:
    """KV cache for one block's attention (see attention.init_kv_cache)."""
    return init_kv_cache(cfg.attn, batch, max_len, dtype, quantized, ragged)


def _fused_block_h(hdim: int, cap: int = 2048) -> int:
    """Largest hidden-slab width ≤ ``cap`` that divides ``hdim`` and is a
    multiple of GROUP_ROWS — the two constraints the fused kernels enforce
    (kernels/fused_mlp.py). Returns 0 when no valid slab exists; the gates
    below use that as "not fusable" so the slab the gate checked is exactly
    the slab the call passes (a 3072/5120/7168 d_ff previously passed a
    1024-divisibility gate and then crashed on a hardcoded 2048 slab)."""
    from smmb_tpu.formats.packed import GROUP_ROWS

    best = 0
    for bh in range(GROUP_ROWS, min(cap, hdim) + 1, GROUP_ROWS):
        if hdim % bh == 0:
            best = bh
    return best


def _mlp_fusable(packed, h2d, compute_dtype, use_kernel):
    """Route the decode-regime MLP through the one-launch fused kernel?

    The fused kernel exists for the dispatch-bound small-M decode step
    (docs/PROFILE.md: ctx-512 step at 0.34 of floor across ~20 launches);
    large-M prefill keeps two packed_spmm calls whose compute-bound tile
    heuristics (wide-N) win there. Float-only (W2A8 needs a global up
    absmax the slab schedule can't know), no LoRA (adapter adds
    pre-activation), group-aligned shapes, and K ≤ 2048 (full-K weight
    tiles at 4096 hit the known pathological Mosaic compile,
    docs/ROADMAP.md #4)."""
    from smmb_tpu.formats.packed import GROUP_ROWS

    k = h2d.shape[-1]
    hdim = packed["w_up"].shape[1]
    return (
        use_kernel
        and packed.get("w_up_lora") is None
        and packed.get("w_down_lora") is None
        and h2d.shape[0] <= 32
        and jnp.dtype(compute_dtype)
        in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        and k % GROUP_ROWS == 0
        and k <= 2048
        and _fused_block_h(hdim, 1024) > 0
        and packed["w_down"].shape == (hdim, k)
    )


def _tail_fusable(packed, m, compute_dtype, use_kernel):
    """Route the whole block tail (wo + residual + norm2 + MLP) through the
    one-launch fused kernel (kernels/fused_mlp.fused_block_tail)?

    Same regime and reasons as ``_mlp_fusable`` plus the ``wo`` plane: no
    adapter on any fused weight, group-aligned A/D/H, and D ≤ 2048 so the
    full-depth weight tiles stay clear of the 4096-row Mosaic pathology
    (docs/ROADMAP.md #4)."""
    from smmb_tpu.formats.packed import GROUP_ROWS

    ap = packed["attn"]
    a, dm = ap["wo"].shape
    hdim = packed["w_up"].shape[1]
    return (
        use_kernel
        and m <= 32
        and jnp.dtype(compute_dtype)
        in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        and ap.get("wo_lora") is None
        and packed.get("w_up_lora") is None
        and packed.get("w_down_lora") is None
        and a % GROUP_ROWS == 0
        and a <= 2048
        and dm % GROUP_ROWS == 0
        and dm <= 2048
        and _fused_block_h(hdim) > 0
        and packed["w_down"].shape == (hdim, dm)
    )


def _fused_tail(packed, out, x, cfg, compute_dtype):
    """Apply ``fused_block_tail`` to the pre-``wo`` attention mix ``out``
    (B, T, A) with residual stream ``x`` (B, T, D)."""
    from smmb_tpu.kernels.fused_mlp import fused_block_tail

    ap = packed["attn"]
    hdim = packed["w_up"].shape[1]
    y = fused_block_tail(
        out.reshape(-1, out.shape[-1]),
        x.reshape(-1, x.shape[-1]),
        ap["wo"],
        ap["wo_scale"],
        ap["bo"],
        packed["norm2"],
        packed["w_up"],
        packed["s_up"],
        packed["b_up"],
        packed["w_down"],
        packed["s_down"],
        packed["b_down"],
        alpha=cfg.alpha,
        eps=cfg.eps,
        compute_dtype=compute_dtype,
        block_h=_fused_block_h(hdim),
    )
    return y.reshape(x.shape)


def _mlp_half(packed, x, cfg, spmm, compute_dtype=None, use_kernel=False):
    h = rmsnorm(x, packed["norm2"], cfg.eps)
    up_lora = packed.get("w_up_lora")
    if up_lora is None:
        h2d = h.reshape(-1, h.shape[-1])
        if compute_dtype is not None and _mlp_fusable(
            packed, h2d, compute_dtype, use_kernel
        ):
            from smmb_tpu.kernels.fused_mlp import fused_mlp

            hdim = packed["w_up"].shape[1]
            down = fused_mlp(
                h2d,
                packed["w_up"],
                packed["s_up"],
                packed["b_up"],
                packed["w_down"],
                packed["s_down"],
                packed["b_down"],
                alpha=cfg.alpha,
                compute_dtype=compute_dtype,
                block_h=_fused_block_h(hdim, 1024),
            ).reshape(x.shape)
            return x + down
        up = spmm(h, packed["w_up"], packed["s_up"], packed["b_up"], cfg.alpha)
    else:
        # adapter adds pre-activation, so the PReLU epilogue can't stay
        # fused in the kernel — base runs epilogue-free, PReLU after
        a, b_, sc = up_lora
        pre = spmm(h, packed["w_up"], packed["s_up"], packed["b_up"])
        up = prelu(pre + jnp.matmul(jnp.matmul(h, a), b_) * sc, cfg.alpha)
    down = spmm(up, packed["w_down"], packed["s_down"], packed["b_down"])
    dn_lora = packed.get("w_down_lora")
    if dn_lora is not None:
        a, b_, sc = dn_lora
        down = down + jnp.matmul(jnp.matmul(up, a), b_) * sc
    return x + down


def _make_spmm(compute_dtype, use_kernel):
    def spmm(inp, w, s, b, alpha=None):
        inp = inp * s
        if use_kernel:
            return packed_spmm(inp, w, b, alpha, compute_dtype=compute_dtype)
        return packed_spmm_jnp(inp, w, b, alpha, dtype=compute_dtype)

    return spmm


def qat_block_forward(
    params: dict,
    x: jax.Array,
    cfg: TernaryBlockConfig,
    attn_chunk: int | None = None,
) -> jax.Array:
    """Training forward on the master weights: STE-ternarized projections
    (differentiable), mirroring the serving math exactly — the trained
    pytree packs to the serving form via ``pack_block(quantize=True)``.
    ``attn_chunk``: memory-efficient attention for long-context training.
    """
    from smmb_tpu.models.attention import qat_attention_forward
    from smmb_tpu.models.train import absmean_scale, ternarize_ste
    from smmb_tpu.ops.dense import prelu

    h = rmsnorm(x, params["norm1"], cfg.eps)
    x = x + qat_attention_forward(
        params["attn"], h, cfg.attn, attn_chunk=attn_chunk
    )

    def qlin(inp, w, b):
        wq = ternarize_ste(w) * absmean_scale(w)
        return jnp.dot(inp, wq, preferred_element_type=jnp.float32) + b

    h = rmsnorm(x, params["norm2"], cfg.eps)
    up = prelu(qlin(h, params["w_up"], params["b_up"]), cfg.alpha)
    return x + qlin(up, params["w_down"], params["b_down"])


def block_prefill(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    valid=None,
) -> tuple[jax.Array, dict]:
    """Prompt pass: full block forward + KV-cache fill. Returns (y, cache).
    ``valid`` (B, T): real-token mask for left-padded ragged batches."""
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash, valid=valid,
    )
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    att, cache = attention_prefill(packed["attn"], h, cache, cfg.attn, **kw)
    x = x + att
    return _mlp_half(packed, x, cfg, _make_spmm(compute_dtype, use_kernel), compute_dtype, use_kernel), cache


def block_decode_step(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    """One serving decode step through the block: x_t is (B, 1, d_model);
    attention reads the cache (O(T·D)) instead of recomputing T×T scores.
    ``use_flash`` routes the cache read through the flash-decode kernel."""
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel, precision=precision
    )
    b, t, _ = x_t.shape
    if _tail_fusable(packed, b * t, compute_dtype, use_kernel):
        from smmb_tpu.models.attention import (
            _qkv_prenorm_fusable,
            attention_decode_core,
        )

        if _qkv_prenorm_fusable(
            packed["attn"], cfg.attn, compute_dtype, use_kernel
        ):
            # norm1 rides the fused QKV kernel: the whole block is three
            # launches (norm+qkv, cache read, wo+residual+norm2+MLP)
            out, cache = attention_decode_core(
                packed["attn"], x_t, cache, cfg.attn, use_flash=use_flash,
                prenorm=(packed["norm1"], cfg.eps), **kw
            )
        else:
            h = rmsnorm(x_t, packed["norm1"], cfg.eps)
            out, cache = attention_decode_core(
                packed["attn"], h, cache, cfg.attn, use_flash=use_flash, **kw
            )
        return _fused_tail(packed, out, x_t, cfg, compute_dtype), cache
    h = rmsnorm(x_t, packed["norm1"], cfg.eps)
    att, cache = attention_decode_step(
        packed["attn"], h, cache, cfg.attn, use_flash=use_flash, **kw
    )
    x_t = x_t + att
    y = _mlp_half(packed, x_t, cfg, _make_spmm(compute_dtype, use_kernel), compute_dtype, use_kernel)
    return y, cache


def block_extend(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    """Chunked-prefill step through the block: x is a (B, C, d_model) chunk
    appended at the cache position; attention covers the cache plus the
    chunk (attention_extend). MLP/norms are per-token. ``use_flash``
    routes the cache read through the flash-chunk kernel. Returns
    (y, cache)."""
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    b, c, _ = x.shape
    if _tail_fusable(packed, b * c, compute_dtype, use_kernel):
        # same fused tail + prenorm-QKV as the decode step (M=C rows):
        # per-row bitwise identity between the two is the spec contract
        from smmb_tpu.models.attention import (
            _qkv_prenorm_fusable,
            attention_extend_core,
        )

        if _qkv_prenorm_fusable(
            packed["attn"], cfg.attn, compute_dtype, use_kernel
        ):
            out, cache = attention_extend_core(
                packed["attn"], x, cache, cfg.attn,
                prenorm=(packed["norm1"], cfg.eps), **kw
            )
        else:
            h = rmsnorm(x, packed["norm1"], cfg.eps)
            out, cache = attention_extend_core(
                packed["attn"], h, cache, cfg.attn, **kw
            )
        return _fused_tail(packed, out, x, cfg, compute_dtype), cache
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    att, cache = attention_extend(packed["attn"], h, cache, cfg.attn, **kw)
    x = x + att
    y = _mlp_half(packed, x, cfg, _make_spmm(compute_dtype, use_kernel), compute_dtype, use_kernel)
    return y, cache
