"""Flash-attention kernel parity vs the einsum oracle.

The jnp grouped-einsum path (models/attention._attention_math) is the
semantic oracle; the Pallas kernel must match it within accumulation noise
(both compute scores in f32, so agreement is tight in f32 inputs).
"""

import jax
import jax.numpy as jnp
import pytest

from smmb_tpu.kernels.flash_attention import flash_attention
from smmb_tpu.models.attention import TernaryAttentionConfig, _attention_math


def _oracle(q4, k4, v4, cfg):
    """einsum path via _attention_math; takes (B, H, T, hd) layout."""
    b, h, t, hd = q4.shape
    kvh = k4.shape[1]
    q = q4.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
    k = k4.transpose(0, 2, 1, 3).reshape(b, t, kvh * hd)
    v = v4.transpose(0, 2, 1, 3).reshape(b, t, kvh * hd)
    y = _attention_math(q, k, v, cfg, precision=jax.lax.Precision.HIGHEST)
    return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)


def _rand_qkv(key, b, h, kvh, t, hd, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, t, hd), dtype)
    k = jax.random.normal(kk, (b, kvh, t, hd), dtype)
    v = jax.random.normal(kv, (b, kvh, t, hd), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "b,h,kvh,t,hd",
    [
        (2, 4, 4, 64, 64),  # MHA, hd below the 128-lane tile (pad path)
        (1, 4, 2, 96, 128),  # GQA, T not a block multiple
        (2, 8, 2, 128, 64),  # GQA group of 4
    ],
)
def test_flash_matches_einsum(causal, b, h, kvh, t, hd):
    cfg = TernaryAttentionConfig(
        d_model=h * hd, n_heads=h, causal=causal,
        n_kv_heads=kvh if kvh != h else None,
    )
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, h, kvh, t, hd)
    got = flash_attention(q, k, v, causal=causal, block_q=64, block_kv=64)
    want = _oracle(q, k, v, cfg)
    assert jnp.max(jnp.abs(got - want)) < 1e-5


def test_flash_multi_kv_tiles_online_softmax():
    """T spanning several KV tiles exercises the running-max rescale."""
    cfg = TernaryAttentionConfig(d_model=2 * 64, n_heads=2, causal=True)
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 2, 300, 64)
    # big score magnitudes stress the online max/rescale
    q = q * 4.0
    got = flash_attention(q, k, v, block_q=64, block_kv=64)
    want = _oracle(q, k, v, cfg)
    assert jnp.max(jnp.abs(got - want)) < 1e-5


def test_flash_bf16():
    cfg = TernaryAttentionConfig(d_model=4 * 64, n_heads=4, causal=True)
    q, k, v = _rand_qkv(
        jax.random.PRNGKey(2), 2, 4, 4, 128, 64, dtype=jnp.bfloat16
    )
    got = flash_attention(q, k, v, block_q=64, block_kv=64)
    want = _oracle(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        cfg,
    )
    assert got.dtype == jnp.bfloat16
    assert jnp.max(jnp.abs(got.astype(jnp.float32) - want)) < 0.05


def test_flash_default_blocks_nonaligned():
    """Default block heuristic with T that is not 128-aligned."""
    cfg = TernaryAttentionConfig(d_model=2 * 128, n_heads=2, causal=True)
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 2, 200, 128)
    got = flash_attention(q, k, v)
    want = _oracle(q, k, v, cfg)
    assert jnp.max(jnp.abs(got - want)) < 1e-5


def test_attention_forward_flash_path():
    """End-to-end: packed projections with use_flash=True match the default."""
    from smmb_tpu.models.attention import (
        attention_forward, init_attention, pack_attention,
    )

    cfg = TernaryAttentionConfig(d_model=256, n_heads=4, n_kv_heads=2)
    params = init_attention(jax.random.PRNGKey(4), cfg)
    packed = pack_attention(params)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 96, 256))
    base = attention_forward(
        packed, x, cfg, precision=jax.lax.Precision.HIGHEST
    )
    flash = attention_forward(packed, x, cfg, use_flash=True)
    # outputs are O(300) at d=256 ternary projections; compare relatively
    rel = jnp.max(jnp.abs(base - flash)) / jnp.max(jnp.abs(base))
    assert rel < 1e-4


def test_block_and_lm_flash_paths():
    """use_flash plumbs through block_forward and lm_prefill/generate."""
    from smmb_tpu.models.lm import (
        TernaryLMConfig, generate, init_lm, lm_forward, pack_lm,
    )

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=64
    )
    params = init_lm(jax.random.PRNGKey(6), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(7), (2, 32), 0, cfg.vocab)
    base = lm_forward(packed, toks, cfg, precision=jax.lax.Precision.HIGHEST)
    flash = lm_forward(packed, toks, cfg, use_flash=True)
    rel = jnp.max(jnp.abs(base - flash)) / jnp.max(jnp.abs(base))
    assert rel < 1e-4
    # greedy generations agree (flash applies to prefill only)
    g0 = generate(packed, toks, cfg, steps=8)
    g1 = generate(packed, toks, cfg, steps=8, use_flash=True)
    assert jnp.array_equal(g0, g1)


def test_flash_pipeline_p_matches_serial():
    """The measured-and-rejected pipelined variant stays bitwise-parity
    with the serial kernel (design point kept per DESIGN.md 'Flash
    prefill occupancy bound'; causal + window)."""
    import numpy as np

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    for win in (None, 64):
        q = jax.random.normal(k1, (1, 2, 256, 128), jnp.float32)
        k = jax.random.normal(k2, (1, 2, 256, 128), jnp.float32)
        v = jax.random.normal(k3, (1, 2, 256, 128), jnp.float32)
        ref = np.asarray(flash_attention(
            q, k, v, causal=True, window=win, block_q=128, block_kv=128
        ))
        got = np.asarray(flash_attention(
            q, k, v, causal=True, window=win, block_q=128, block_kv=128,
            pipeline_p=True,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-6)
