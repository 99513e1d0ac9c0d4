"""MoE transformer block: attention + routed ternary expert FFN.

The Switch-Transformer/Mixtral block shape — identical to
models/transformer.py's dense block except the MLP half is the routed
mixture (models/moe.py): every token picks its top-k experts, each expert
a 2-bit packed ternary FFN. Ternary MoE is unusually TPU-friendly: at 2
bits/element 8 experts cost the HBM of half a dense fp32 FFN, so the
sparse-capacity win is nearly free.

The interface mirrors transformer.py one-for-one (init/pack/forward/
prefill/decode_step/extend/init_cache), which is what lets models/lm.py
swap block kinds via one config field (``TernaryLMConfig.n_experts``) —
the whole serving stack (generate, chunked prefill, beam, speculative
decoding, kv-quant/ragged caches) then works over MoE blocks unchanged,
because everything cache-shaped lives in the attention half.

Routing note: the router sees rmsnorm'd activations per token; decode
routes a single token exactly like prefill routes T of them (the one-hot
dispatch is per-token algebra), so decode-vs-forward parity holds.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    attention_decode_step,
    attention_extend,
    attention_forward,
    attention_prefill,
    init_attention,
    init_kv_cache,
    pack_attention,
)
from smmb_tpu.models.moe import (
    TernaryMoEConfig,
    init_moe,
    moe_forward,
    pack_moe,
)
from smmb_tpu.models.transformer import rmsnorm


@dataclasses.dataclass(frozen=True)
class TernaryMoEBlockConfig:
    d_model: int
    n_heads: int
    d_ff: int  # per-expert hidden width
    n_experts: int = 8
    top_k: int = 1
    capacity_factor: float = 1.25
    alpha: float = 0.2
    causal: bool = True
    non_zero: int = 2
    eps: float = 1e-6
    n_kv_heads: int | None = None
    rope: bool = False
    rope_theta: float = 10000.0
    window: int | None = None

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

    @property
    def moe(self) -> TernaryMoEConfig:
        return TernaryMoEConfig(
            d_model=self.d_model,
            d_ff=self.d_ff,
            n_experts=self.n_experts,
            capacity_factor=self.capacity_factor,
            alpha=self.alpha,
            non_zero=self.non_zero,
            top_k=self.top_k,
        )


def init_moe_block(key: jax.Array, cfg: TernaryMoEBlockConfig) -> dict:
    ka, km = jax.random.split(key)
    return {
        "attn": init_attention(ka, cfg.attn),
        "moe": init_moe(km, cfg.moe),
        "norm1": jnp.ones((cfg.d_model,)),
        "norm2": jnp.ones((cfg.d_model,)),
    }


def pack_moe_block(params: dict, quantize: bool = False) -> dict:
    return {
        "attn": pack_attention(params["attn"], quantize=quantize),
        "moe": pack_moe(params["moe"], quantize=quantize),
        "norm1": params["norm1"],
        "norm2": params["norm2"],
    }


def init_moe_block_cache(
    cfg: TernaryMoEBlockConfig,
    batch: int,
    max_len: int,
    dtype=jnp.float32,
    quantized: bool = False,
    ragged: bool = False,
) -> dict:
    return init_kv_cache(cfg.attn, batch, max_len, dtype, quantized, ragged)


def _moe_half(packed, x, cfg, compute_dtype, use_kernel):
    h = rmsnorm(x, packed["norm2"], cfg.eps)
    b, t, d = h.shape
    # no_drop: serving must route each token independently of its
    # neighbors or decode would disagree with prefill (capacity pressure
    # is call-local); see moe_forward's docstring
    y = moe_forward(
        packed["moe"], h.reshape(b * t, d), cfg.moe,
        compute_dtype=compute_dtype, use_kernel=use_kernel, no_drop=True,
    )
    return x + y.reshape(b, t, d)


def moe_block_forward(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMoEBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> jax.Array:
    """Pre-norm MoE block: x + attn(norm(x)), then x + moe(norm(x))."""
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    x = x + attention_forward(
        packed["attn"], h, cfg.attn,
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    return _moe_half(packed, x, cfg, compute_dtype, use_kernel)


def moe_block_prefill(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryMoEBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    valid=None,
) -> tuple[jax.Array, dict]:
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash, valid=valid,
    )
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    att, cache = attention_prefill(packed["attn"], h, cache, cfg.attn, **kw)
    x = x + att
    return _moe_half(packed, x, cfg, compute_dtype, use_kernel), cache


def moe_block_extend(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryMoEBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    h = rmsnorm(x, packed["norm1"], cfg.eps)
    att, cache = attention_extend(packed["attn"], h, cache, cfg.attn, **kw)
    x = x + att
    return _moe_half(packed, x, cfg, compute_dtype, use_kernel), cache


def moe_block_decode_step(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryMoEBlockConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel, precision=precision
    )
    h = rmsnorm(x_t, packed["norm1"], cfg.eps)
    att, cache = attention_decode_step(
        packed["attn"], h, cache, cfg.attn, use_flash=use_flash, **kw
    )
    x_t = x_t + att
    return _moe_half(packed, x_t, cfg, compute_dtype, use_kernel), cache


def qat_moe_block_forward(
    params: dict,
    x: jax.Array,
    cfg: TernaryMoEBlockConfig,
    attn_chunk: int | None = None,
):
    """STE training forward; returns (y, load-balance aux loss)."""
    from smmb_tpu.models.attention import qat_attention_forward
    from smmb_tpu.models.moe import qat_moe_forward

    h = rmsnorm(x, params["norm1"], cfg.eps)
    x = x + qat_attention_forward(
        params["attn"], h, cfg.attn, attn_chunk=attn_chunk
    )
    h2 = rmsnorm(x, params["norm2"], cfg.eps)
    b, t, d = h2.shape
    y, aux = qat_moe_forward(params["moe"], h2.reshape(b * t, d), cfg.moe)
    return x + y.reshape(b, t, d), aux
