"""Fused two-plane MLP kernel: parity vs the two-call path + f64 oracle,
and the block-level routing gate (models/transformer._mlp_fusable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.kernels.fused_mlp import fused_mlp
from smmb_tpu.ops.dense import prelu
from smmb_tpu.utils import rng


def _ref_f64(x, wu, bu, su, wd, bd, sd, alpha):
    x = np.asarray(x, np.float64)
    up = np.asarray(x * su, np.float64) @ np.asarray(wu, np.float64) + np.asarray(
        bu, np.float64
    )
    up = np.where(up > 0, up, alpha * up)
    return (up * sd) @ np.asarray(wd, np.float64) + np.asarray(bd, np.float64)


def _mk(key, m, k, h, kout):
    ks = jax.random.split(key, 5)
    x = rng.rand_dense(ks[0], (m, k))
    wu = rng.rand_ternary(ks[1], (k, h), non_zero=2)
    wd = rng.rand_ternary(ks[2], (h, kout), non_zero=2)
    bu = rng.rand_dense(ks[3], (h,))
    bd = rng.rand_dense(ks[4], (kout,))
    return x, wu, bu, wd, bd


@pytest.mark.parametrize("m", [1, 8])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_mlp_parity(key, m, dtype):
    k, h, kout = 512, 1024, 512
    x, wu, bu, wd, bd = _mk(key, m, k, h, kout)
    su, sd = jnp.float32(0.37), jnp.float32(1.21)
    alpha = 0.2
    y = fused_mlp(
        x,
        pack_ternary(np.asarray(wu)),
        su,
        bu,
        pack_ternary(np.asarray(wd)),
        sd,
        bd,
        alpha=alpha,
        compute_dtype=dtype,
        block_h=512,
    )
    oracle = _ref_f64(x, wu, bu, float(su), wd, bd, float(sd), alpha)
    tol = 1e-4 if dtype == jnp.float32 else 0.05 * np.abs(oracle).max()
    assert np.abs(np.asarray(y, np.float64) - oracle).max() < tol


def test_fused_mlp_multi_slab(key):
    # H spans several block_h slabs: slab interleave must accumulate right
    k, h, kout = 512, 2048, 512
    x, wu, bu, wd, bd = _mk(key, 1, k, h, kout)
    y = fused_mlp(
        x,
        pack_ternary(np.asarray(wu)),
        jnp.float32(1.0),
        bu,
        pack_ternary(np.asarray(wd)),
        jnp.float32(1.0),
        bd,
        alpha=0.2,
        compute_dtype=jnp.float32,
        block_h=512,
    )
    oracle = _ref_f64(x, wu, bu, 1.0, wd, bd, 1.0, 0.2)
    # |Y| ~ 4e2 at this depth: scale-aware f32 tolerance (rel ~1e-5)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), oracle, rtol=1e-5, atol=1e-4
    )


def test_fused_mlp_rejects_int8(key):
    x, wu, bu, wd, bd = _mk(key, 1, 512, 512, 512)
    with pytest.raises(ValueError, match="float-only"):
        fused_mlp(
            x,
            pack_ternary(np.asarray(wu)),
            jnp.float32(1.0),
            bu,
            pack_ternary(np.asarray(wd)),
            jnp.float32(1.0),
            bd,
            alpha=0.2,
            compute_dtype=jnp.int8,
        )


def test_block_decode_routes_fused(key):
    """block_decode_step output is unchanged (within tolerance) by the fused
    routing — decode step parity bf16 kernel vs jnp reference path."""
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_decode_step,
        init_block,
        init_block_cache,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=1024)
    params = init_block(key, cfg)
    packed = pack_block(params, quantize=True)
    cache_a = init_block_cache(cfg, 2, 16)
    cache_b = init_block_cache(cfg, 2, 16)
    x_t = rng.rand_dense(jax.random.PRNGKey(7), (2, 1, cfg.d_model))
    # fused path (use_kernel=True, float dtype, aligned shapes → gate on)
    y_a, _ = block_decode_step(
        packed, x_t, cache_a, cfg, compute_dtype=jnp.float32, use_kernel=True
    )
    # reference path (jnp spmm, no fusion)
    y_b, _ = block_decode_step(
        packed, x_t, cache_b, cfg, compute_dtype=jnp.float32, use_kernel=False
    )
    np.testing.assert_allclose(
        np.asarray(y_a), np.asarray(y_b), atol=2e-4, rtol=1e-4
    )


def test_fused_block_tail_parity(key):
    """fused_block_tail == wo-proj + residual + rmsnorm + two-spmm MLP."""
    from smmb_tpu.formats.packed import pack_ternary as pt
    from smmb_tpu.kernels.fused_mlp import fused_block_tail

    m, a, d, hdim = 2, 512, 512, 1024
    ks = jax.random.split(key, 8)
    att = rng.rand_dense(ks[0], (m, a))
    x = rng.rand_dense(ks[1], (m, d))
    wo = rng.rand_ternary(ks[2], (a, d), non_zero=2)
    bo = rng.rand_dense(ks[3], (d,))
    g2 = 1.0 + 0.1 * rng.rand_dense(ks[4], (d,))
    xx, wu, bu, wd, bd = _mk(ks[5], m, d, hdim, d)
    s_wo, s_up, s_down = 0.9, 0.37, 1.21
    eps, alpha = 1e-6, 0.2

    y = fused_block_tail(
        att, x, pt(np.asarray(wo)), jnp.float32(s_wo), bo, g2,
        pt(np.asarray(wu)), jnp.float32(s_up), bu,
        pt(np.asarray(wd)), jnp.float32(s_down), bd,
        alpha=alpha, eps=eps, compute_dtype=jnp.float32, block_h=512,
    )
    # reference composition in f64
    attn_out = np.asarray(att, np.float64) * s_wo @ np.asarray(
        wo, np.float64
    ) + np.asarray(bo, np.float64)
    resid = np.asarray(x, np.float64) + attn_out
    ms = (resid**2).mean(-1, keepdims=True)
    h2 = resid / np.sqrt(ms + eps) * np.asarray(g2, np.float64)
    oracle = resid + _ref_f64(h2, wu, bu, s_up, wd, bd, s_down, alpha)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), oracle, rtol=1e-5, atol=2e-4
    )


def test_fused_block_tail_row_identity(key):
    """A row's result is bitwise independent of the other rows in the call
    (M=1 vs M=C) — the spec-decode losslessness contract through the tail."""
    from smmb_tpu.formats.packed import pack_ternary as pt
    from smmb_tpu.kernels.fused_mlp import fused_block_tail

    c, a, d, hdim = 4, 512, 512, 1024
    ks = jax.random.split(key, 6)
    att = rng.rand_dense(ks[0], (c, a))
    x = rng.rand_dense(ks[1], (c, d))
    wo = rng.rand_ternary(ks[2], (a, d), non_zero=2)
    bo = rng.rand_dense(ks[3], (d,))
    g2 = jnp.ones((d,))
    _, wu, bu, wd, bd = _mk(ks[4], 1, d, hdim, d)
    args = (
        pt(np.asarray(wo)), jnp.float32(1.0), bo, g2,
        pt(np.asarray(wu)), jnp.float32(1.0), bu,
        pt(np.asarray(wd)), jnp.float32(1.0), bd,
    )
    kw = dict(alpha=0.2, eps=1e-6, compute_dtype=jnp.bfloat16, block_h=512)
    y_chunk = np.asarray(fused_block_tail(att, x, *args, **kw))
    for r in range(c):
        y_row = np.asarray(
            fused_block_tail(att[r : r + 1], x[r : r + 1], *args, **kw)
        )
        np.testing.assert_array_equal(y_chunk[r], y_row[0])


def test_block_decode_fused_tail_vs_reference(key):
    """block_decode_step with the fused tail (kernel) matches the unfused
    jnp reference path."""
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_decode_step,
        init_block,
        init_block_cache,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=1024, rope=True)
    params = init_block(key, cfg)
    packed = pack_block(params, quantize=True)
    x_t = rng.rand_dense(jax.random.PRNGKey(3), (2, 1, cfg.d_model))
    ya, _ = block_decode_step(
        packed, x_t, init_block_cache(cfg, 2, 16), cfg,
        compute_dtype=jnp.float32, use_kernel=True,
    )
    yb, _ = block_decode_step(
        packed, x_t, init_block_cache(cfg, 2, 16), cfg,
        compute_dtype=jnp.float32, use_kernel=False,
    )
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yb), atol=3e-4, rtol=1e-4
    )


def test_block_decode_non_pow2_dff(key):
    """d_ff=3072 (non-power-of-two, as in 4×d with d=768-class models): the
    fused-tail gate and the slab the call passes must agree (ADVICE r4: a
    1024-divisibility gate paired with a hardcoded 2048 slab crashed here).
    Kernel path must run and match the unfused reference."""
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        _fused_block_h,
        block_decode_step,
        init_block,
        init_block_cache,
        pack_block,
    )

    assert _fused_block_h(3072) == 1536
    assert _fused_block_h(5120) == 1024
    assert _fused_block_h(7168) == 1024
    assert _fused_block_h(4096) == 2048
    assert _fused_block_h(512) == 512
    assert _fused_block_h(256) == 0
    assert _fused_block_h(3072, 1024) == 1024

    cfg = TernaryBlockConfig(d_model=1024, n_heads=8, d_ff=3072)
    params = init_block(key, cfg)
    packed = pack_block(params, quantize=True)
    x_t = rng.rand_dense(jax.random.PRNGKey(11), (1, 1, cfg.d_model))
    ya, _ = block_decode_step(
        packed, x_t, init_block_cache(cfg, 1, 16), cfg,
        compute_dtype=jnp.bfloat16, use_kernel=True,
    )
    yb, _ = block_decode_step(
        packed, x_t, init_block_cache(cfg, 1, 16), cfg,
        compute_dtype=jnp.float32, use_kernel=False,
    )
    scale = np.abs(np.asarray(yb)).max()
    assert np.abs(np.asarray(ya, np.float64) - np.asarray(yb, np.float64)).max() < 0.05 * scale


def test_mlp_fusable_gate():
    from smmb_tpu.formats.packed import pack_ternary
    from smmb_tpu.models.transformer import _mlp_fusable

    wu = pack_ternary(np.sign(np.random.RandomState(0).randn(512, 1024)))
    wd = pack_ternary(np.sign(np.random.RandomState(1).randn(1024, 512)))
    packed = {"w_up": wu, "w_down": wd}
    h_small = jnp.zeros((1, 512))
    assert _mlp_fusable(packed, h_small, jnp.bfloat16, True)
    assert not _mlp_fusable(packed, h_small, jnp.bfloat16, False)
    assert not _mlp_fusable(packed, h_small, jnp.int8, True)
    assert not _mlp_fusable(packed, jnp.zeros((64, 512)), jnp.bfloat16, True)
    # LoRA adapters disable fusion
    assert not _mlp_fusable(
        {**packed, "w_up_lora": (1, 2, 3)}, h_small, jnp.bfloat16, True
    )


def test_fused_norm_qkv_parity(key):
    """fused_norm_qkv == rmsnorm + packed_spmm_jnp with per-column scale."""
    from smmb_tpu.formats.packed import pack_ternary as pt
    from smmb_tpu.kernels.fused_mlp import fused_norm_qkv

    m, d, n = 2, 512, 1536
    ks = jax.random.split(key, 4)
    x = rng.rand_dense(ks[0], (m, d))
    g = 1.0 + 0.1 * rng.rand_dense(ks[1], (d,))
    w = rng.rand_ternary(ks[2], (d, n), non_zero=2)
    b = rng.rand_dense(ks[3], (n,))
    sc = jnp.concatenate(
        [jnp.full((512,), 0.7), jnp.full((512,), 1.1), jnp.full((512,), 0.9)]
    ).astype(jnp.float32)
    eps = 1e-6
    y = fused_norm_qkv(
        x, g, pt(np.asarray(w)), sc, b, eps=eps, compute_dtype=jnp.float32
    )
    x64 = np.asarray(x, np.float64)
    h = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + eps) * np.asarray(
        g, np.float64
    )
    oracle = h @ np.asarray(w, np.float64) * np.asarray(
        sc, np.float64
    ) + np.asarray(b, np.float64)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), oracle, rtol=1e-5, atol=2e-4
    )


def test_fused_norm_qkv_quant_parity(key):
    """fused_norm_qkv_quant == fused_norm_qkv + _quantize_kv interleave:
    q matches exactly-ish (same dot), codes/scales match the post-hoc
    quantize path (same absmax rule in f32)."""
    from smmb_tpu.formats.packed import pack_ternary as pt
    from smmb_tpu.kernels.fused_mlp import fused_norm_qkv, fused_norm_qkv_quant
    from smmb_tpu.models.attention import _quantize_kv

    m, d, kvh, hd = 3, 512, 2, 128
    kvd = kvh * hd
    n = d + 2 * kvd
    ks = jax.random.split(key, 4)
    x = rng.rand_dense(ks[0], (m, d))
    g = 1.0 + 0.1 * rng.rand_dense(ks[1], (d,))
    w = rng.rand_ternary(ks[2], (d, n), non_zero=2)
    b = rng.rand_dense(ks[3], (n,))
    sc = jnp.concatenate(
        [jnp.full((d,), 0.7), jnp.full((kvd,), 1.1), jnp.full((kvd,), 0.9)]
    ).astype(jnp.float32)
    kw = dict(eps=1e-6, compute_dtype=jnp.float32)
    wp = pt(np.asarray(w))
    y = fused_norm_qkv(x, g, wp, sc, b, **kw)
    q, codes, scales = fused_norm_qkv_quant(
        x, g, wp, sc, b, d_model=d, kv_heads=kvh, head_dim=hd, **kw
    )
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(y[:, :d]), atol=1e-5, rtol=1e-6
    )
    # oracle: quantize the float k/v halves with the jnp rule
    kf = y[:, d : d + kvd].reshape(m, 1, kvh, hd)
    vf = y[:, d + kvd :].reshape(m, 1, kvh, hd)
    kq, ksc = _quantize_kv(kf)
    vq, vsc = _quantize_kv(vf)
    want_codes = np.asarray(
        jnp.stack([kq[:, 0], vq[:, 0]], axis=2).reshape(m, 2 * kvd)
    )
    want_scales = np.asarray(
        jnp.stack([ksc[:, 0, :, 0], vsc[:, 0, :, 0]], axis=2).reshape(
            m, 2 * kvh
        )
    )
    got_codes = np.asarray(codes, np.int32)
    # codes may differ by 1 ulp of rounding where the dot paths round
    # differently; scales must match to f32 noise
    np.testing.assert_allclose(got_codes, want_codes.astype(np.int32), atol=1)
    np.testing.assert_allclose(
        np.asarray(scales), want_scales, rtol=1e-5, atol=1e-7
    )


def test_block_decode_quant_epilogue_routes(key):
    """block_decode_step with an int8 cache routes through the epilogue-
    quantizing kernel and matches the unfused jnp reference path (which
    quantizes post-hoc) within int8-cache tolerance."""
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_decode_step,
        init_block,
        init_block_cache,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=1024)
    params = init_block(key, cfg)
    packed = pack_block(params, quantize=True)
    x_t = rng.rand_dense(jax.random.PRNGKey(21), (2, 1, cfg.d_model))
    ca = init_block_cache(cfg, 2, 16, quantized=True)
    cb = init_block_cache(cfg, 2, 16, quantized=True)
    ya, ca = block_decode_step(
        packed, x_t, ca, cfg, compute_dtype=jnp.float32, use_kernel=True,
        use_flash=True,
    )
    yb, cb = block_decode_step(
        packed, x_t, cb, cfg, compute_dtype=jnp.float32, use_kernel=False,
    )
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yb), atol=5e-3, rtol=1e-3
    )
    # the caches written by the two paths hold (near-)identical codes
    np.testing.assert_allclose(
        np.asarray(ca["kv"], np.int32)[:, 0],
        np.asarray(cb["kv"], np.int32)[:, 0],
        atol=1,
    )
    np.testing.assert_allclose(
        np.asarray(ca["kv_scale"][:, :, 0]),
        np.asarray(cb["kv_scale"][:, :, 0]),
        rtol=1e-4, atol=1e-6,
    )
