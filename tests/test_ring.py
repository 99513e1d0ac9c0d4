"""Sequence-parallel ring attention parity on the virtual CPU mesh.

Contract: the KV-ring online-softmax attention equals single-device
attention math (and the full packed attention layer) within f32
accumulation tolerance, causal and bidirectional, across ring sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _attention_math,
    attention_forward,
    init_attention,
    pack_attention,
)
from smmb_tpu.parallel import make_mesh
from smmb_tpu.parallel.ring_attention import attention_forward_sp, ring_attention
from smmb_tpu.utils import rng

HI = jax.lax.Precision.HIGHEST


def _qkv(seed, b, t, h, hd):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, t, h, hd)
    return [rng.rand_dense(k, shape) * 0.5 for k in ks]


@pytest.mark.parametrize("data,model", [(1, 2), (1, 4), (2, 4)])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(data, model, causal):
    mesh = make_mesh(data, model, devices=jax.devices()[: data * model])
    b, t, h, hd = 2, 16, 2, 32
    q, k, v = _qkv(7, b, t, h, hd)
    cfg = TernaryAttentionConfig(d_model=h * hd, n_heads=h, causal=causal)
    # reference: single-device attention math on merged heads layout
    ref = _attention_math(
        q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1),
        cfg, precision=HI,
    )
    y = ring_attention(q, k, v, mesh=mesh, causal=causal, precision=HI)
    np.testing.assert_allclose(
        np.asarray(y).reshape(b, t, -1), np.asarray(ref), atol=2e-5, rtol=0
    )


def test_ring_single_ring_degenerate():
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    b, t, h, hd = 1, 8, 2, 16
    q, k, v = _qkv(9, b, t, h, hd)
    cfg = TernaryAttentionConfig(d_model=h * hd, n_heads=h, causal=True)
    ref = _attention_math(
        q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1),
        cfg, precision=HI,
    )
    y = ring_attention(q, k, v, mesh=mesh, causal=True, precision=HI)
    np.testing.assert_allclose(
        np.asarray(y).reshape(b, t, -1), np.asarray(ref), atol=2e-5, rtol=0
    )


@pytest.mark.parametrize("causal", [True, False])
def test_ring_gqa_matches_full(causal):
    # grouped KV heads: the rotating chunks carry only KVH heads
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    b, t, h, kvh, hd = 2, 16, 8, 2, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(17), 3)
    q = rng.rand_dense(kq, (b, t, h, hd)) * 0.5
    k = rng.rand_dense(kk, (b, t, kvh, hd)) * 0.5
    v = rng.rand_dense(kv, (b, t, kvh, hd)) * 0.5
    cfg = TernaryAttentionConfig(
        d_model=h * hd, n_heads=h, causal=causal, n_kv_heads=kvh
    )
    ref = _attention_math(
        q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1),
        cfg, precision=HI,
    )
    y = ring_attention(q, k, v, mesh=mesh, causal=causal, precision=HI)
    np.testing.assert_allclose(
        np.asarray(y).reshape(b, t, -1), np.asarray(ref), atol=2e-5, rtol=0
    )


def test_attention_forward_sp_gqa_matches_single():
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    cfg = TernaryAttentionConfig(d_model=256, n_heads=4, n_kv_heads=2)
    params = init_attention(jax.random.PRNGKey(31), cfg)
    packed = pack_attention(params)
    x = rng.rand_dense(jax.random.PRNGKey(32), (2, 8, cfg.d_model)) * 0.5
    ref = attention_forward(packed, x, cfg, use_kernel=False, precision=HI)
    y = attention_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(2e-4, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), atol=tol, rtol=0
    )


@pytest.mark.parametrize("use_kernel", [False, True])
def test_attention_forward_sp_matches_single(use_kernel):
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    cfg = TernaryAttentionConfig(d_model=256, n_heads=4)
    params = init_attention(jax.random.PRNGKey(21), cfg)
    packed = pack_attention(params)
    x = rng.rand_dense(jax.random.PRNGKey(22), (2, 8, cfg.d_model)) * 0.5
    ref = attention_forward(
        packed, x, cfg, use_kernel=False, precision=HI
    )
    y = attention_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=use_kernel, precision=HI
    )
    tol = max(2e-4, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), atol=tol, rtol=0
    )


def test_block_forward_sp_matches_single():
    """Whole-block sequence parallelism: one shard_map per block, only the
    KV ring communicates; parity vs the single-device block."""
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig, block_forward, init_block, pack_block,
    )
    from smmb_tpu.parallel.sp_block import block_forward_sp

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=512, n_kv_heads=2)
    params = init_block(jax.random.PRNGKey(60), cfg)
    packed = pack_block(params)
    x = rng.rand_dense(jax.random.PRNGKey(61), (2, 32, 512)) * 0.1
    ref = np.asarray(
        block_forward(
            packed, x, cfg, use_kernel=False,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mesh = make_mesh(2, 4)
    y = block_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    # 5e-5 relative: the ring's online-softmax folds exp-sums in rotation
    # order, so attention noise is ~2x the full-row softmax's; magnitudes
    # are rmsnorm-pinned (~1e3) regardless of input scale
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_block_forward_sp_rejects_ragged_t():
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig, init_block, pack_block,
    )
    from smmb_tpu.parallel.sp_block import block_forward_sp

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=512)
    packed = pack_block(init_block(jax.random.PRNGKey(62), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(63), (1, 30, 512))
    mesh = make_mesh(1, 8)
    with pytest.raises(ValueError, match="T=30"):
        block_forward_sp(packed, x, cfg, mesh=mesh, use_kernel=False)


def test_lm_forward_sp_matches_single():
    """Full SP LM forward (embed → SP blocks → head) vs single-device."""
    from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm
    from smmb_tpu.parallel.sp_block import lm_forward_sp

    cfg = TernaryLMConfig(
        vocab=128, d_model=512, n_heads=4, d_ff=512, n_layers=2, max_len=64,
        n_kv_heads=2,
    )
    params = init_lm(jax.random.PRNGKey(64), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(65), (2, 32), 0, cfg.vocab)
    ref = np.asarray(
        lm_forward(
            packed, toks, cfg, use_kernel=False,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mesh = make_mesh(1, 8)
    y = lm_forward_sp(
        packed, toks, cfg, mesh=mesh, use_kernel=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_lm_forward_sp_kernel_path():
    """SP LM with the Pallas kernel path (interpret on CPU)."""
    from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm
    from smmb_tpu.parallel.sp_block import lm_forward_sp

    cfg = TernaryLMConfig(
        vocab=128, d_model=512, n_heads=4, d_ff=512, n_layers=1, max_len=32
    )
    params = init_lm(jax.random.PRNGKey(66), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(67), (1, 16), 0, cfg.vocab)
    ref = np.asarray(
        lm_forward(
            packed, toks, cfg, use_kernel=False,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mesh = make_mesh(1, 4)
    y = lm_forward_sp(packed, toks, cfg, mesh=mesh, use_kernel=True)
    tol = max(1e-3, 1e-4 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)
