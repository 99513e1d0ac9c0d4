"""Sliding-window (local) attention across the serving stack.

Oracle: full attention with the window mask applied in the einsum path
(_attention_math with cfg.window) — itself checked against a hand-rolled
numpy softmax on tiny shapes. The cache paths (decode, chunked prefill),
the flash kernel (with its tile skipping), and the SP ring must agree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.kernels.flash_attention import flash_attention
from smmb_tpu.models.attention import TernaryAttentionConfig, _attention_math
from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_forward,
    lm_init_cache,
    lm_prefill,
    lm_prefill_chunked,
    pack_lm,
)
from smmb_tpu.utils import rng

HI = jax.lax.Precision.HIGHEST

CFG = TernaryLMConfig(
    vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=32,
    window=6,
)


def test_window_math_matches_numpy():
    """Tiny-shape oracle: einsum window mask == hand-rolled numpy."""
    cfg = TernaryAttentionConfig(d_model=2 * 8, n_heads=2, window=3)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    t, hd = 10, 8
    q = jax.random.normal(kq, (1, t, 2 * hd))
    k = jax.random.normal(kk, (1, t, 2 * hd))
    v = jax.random.normal(kv, (1, t, 2 * hd))
    got = np.asarray(_attention_math(q, k, v, cfg, precision=HI))

    qh = np.asarray(q).reshape(1, t, 2, hd)
    kh = np.asarray(k).reshape(1, t, 2, hd)
    vh = np.asarray(v).reshape(1, t, 2, hd)
    want = np.zeros_like(qh)
    for h in range(2):
        s = qh[0, :, h] @ kh[0, :, h].T / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool)) & ~np.tril(
            np.ones((t, t), bool), -3
        )
        s = np.where(mask, s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want[0, :, h] = p @ vh[0, :, h]
    np.testing.assert_allclose(
        got, want.reshape(1, t, -1), atol=1e-5, rtol=0
    )


def test_window_flash_matches_einsum():
    """Flash kernel with window (incl. tile skipping) == einsum mask."""
    cfg = TernaryAttentionConfig(d_model=4 * 64, n_heads=4, window=100)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    b, t, h, hd = 2, 512, 4, 64
    q = jax.random.normal(kq, (b, h, t, hd))
    k = jax.random.normal(kk, (b, h, t, hd))
    v = jax.random.normal(kv, (b, h, t, hd))
    got = flash_attention(q, k, v, causal=True, window=100,
                          block_q=64, block_kv=64)
    q2 = q.transpose(0, 2, 1, 3).reshape(b, t, -1)
    k2 = k.transpose(0, 2, 1, 3).reshape(b, t, -1)
    v2 = v.transpose(0, 2, 1, 3).reshape(b, t, -1)
    want = _attention_math(q2, k2, v2, cfg, precision=HI)
    want = want.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5


def test_window_flash_rejects_noncausal():
    q = jnp.zeros((1, 1, 8, 128))
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, q, q, causal=False, window=4)


def test_window_decode_matches_forward():
    """Windowed prefill + decode == windowed full forward."""
    from smmb_tpu.models.lm import lm_decode_step

    packed = pack_lm(init_lm(jax.random.PRNGKey(2), CFG))
    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, CFG.vocab)
    full = lm_forward(packed, toks, CFG, use_kernel=False, precision=HI)
    logits, cache = lm_prefill(
        packed, toks[:, :10], lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 9]), atol=2e-4, rtol=0
    )
    for i in range(10, 16):
        logits, cache = lm_decode_step(
            packed, toks[:, i], cache, CFG, use_kernel=False, precision=HI
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, i]), atol=2e-4, rtol=0,
            err_msg=f"decode step {i}",
        )


def test_window_chunked_prefill_matches_one_shot():
    packed = pack_lm(init_lm(jax.random.PRNGKey(4), CFG))
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, CFG.vocab)
    l_ref, _ = lm_prefill(
        packed, toks, lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    l_ch, _ = lm_prefill_chunked(
        packed, toks, lm_init_cache(CFG, 2), CFG, chunk=4,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(l_ch), np.asarray(l_ref), atol=2e-4, rtol=0
    )


def test_window_changes_output():
    """The window genuinely restricts attention (guard vs silent no-op)."""
    packed = pack_lm(init_lm(jax.random.PRNGKey(6), CFG))
    toks = jax.random.randint(jax.random.PRNGKey(7), (1, 16), 0, CFG.vocab)
    y_win = lm_forward(packed, toks, CFG, use_kernel=False, precision=HI)
    y_full = lm_forward(
        packed, toks, dataclasses.replace(CFG, window=None),
        use_kernel=False, precision=HI,
    )
    # early positions (< window) see identical context; late ones differ
    assert float(jnp.max(jnp.abs(y_win[:, :5] - y_full[:, :5]))) < 1e-4
    assert float(jnp.max(jnp.abs(y_win[:, -1] - y_full[:, -1]))) > 1e-3


def test_window_generate_flash_matches_plain():
    packed = pack_lm(init_lm(jax.random.PRNGKey(8), CFG))
    toks = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 0, CFG.vocab)
    g0 = generate(packed, toks, CFG, steps=6, use_kernel=False)
    g1 = generate(
        packed, toks, CFG, steps=6, use_kernel=False, use_flash=True
    )
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_window_sp_block_matches_single():
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig, block_forward, init_block, pack_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.sp_block import block_forward_sp

    cfg = TernaryBlockConfig(
        d_model=512, n_heads=4, d_ff=512, window=6, rope=True
    )
    packed = pack_block(init_block(jax.random.PRNGKey(10), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(11), (2, 32, 512)) * 0.1
    ref = np.asarray(
        block_forward(packed, x, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(2, 4)
    y = block_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)
