"""Flash-decode kernel parity (CPU interpret; hardware run in
scripts/verify_flash_decode.py).

The kernel's contract: identical math to the jnp decode path
(models/attention._decode_attention_math) with O(pos) cache traffic —
MHA/GQA grouping, sliding window, int8 cache with in-kernel dequant, and
the dynamic-position tile skip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.kernels.flash_decode import flash_attention_decode
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _cache_kv,
    _decode_attention_math,
    attention_decode_step,
    init_attention,
    init_kv_cache,
    pack_attention,
)
from smmb_tpu.utils import rng


def _filled_cache(key, B, S, kvh, hd, pos, quantized=False):
    cfg = TernaryAttentionConfig(
        d_model=hd * kvh, n_heads=kvh, n_kv_heads=None
    )
    cache = init_kv_cache(cfg, B, max_len=S, quantized=quantized)
    kk, kv = jax.random.split(key)
    k = jax.random.normal(kk, (B, pos + 1, kvh, hd), jnp.float32)
    v = jax.random.normal(kv, (B, pos + 1, kvh, hd), jnp.float32)
    from smmb_tpu.models.attention import _cache_write

    cache = _cache_write(cache, k, v, 0)
    return cache


@pytest.mark.parametrize("h,kvh", [(4, 4), (8, 2)])
@pytest.mark.parametrize("pos", [0, 5, 37])
def test_flash_decode_matches_jnp(h, kvh, pos):
    B, S, hd = 2, 64, 128
    key = jax.random.PRNGKey(h * 100 + pos)
    cache = _filled_cache(key, B, S, kvh, hd, pos)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, h, hd))
    kc, vc = _cache_kv(cache, kvh)
    want = np.asarray(
        _decode_attention_math(q, kc, vc, jnp.int32(pos), hd)
    )
    got = np.asarray(
        flash_attention_decode(
            q[:, 0], cache["k"], cache["v"], jnp.int32(pos), block_kv=32
        )
    ).reshape(B, 1, -1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


@pytest.mark.parametrize("window", [4, 16])
def test_flash_decode_window(window):
    B, S, h, kvh, hd, pos = 1, 64, 4, 2, 128, 33
    key = jax.random.PRNGKey(7)
    cache = _filled_cache(key, B, S, kvh, hd, pos)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, h, hd))
    kc, vc = _cache_kv(cache, kvh)
    want = np.asarray(
        _decode_attention_math(q, kc, vc, jnp.int32(pos), hd, window=window)
    )
    got = np.asarray(
        flash_attention_decode(
            q[:, 0], cache["k"], cache["v"], jnp.int32(pos),
            window=window, block_kv=32,
        )
    ).reshape(B, 1, -1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_flash_decode_int8_cache():
    from smmb_tpu.kernels.flash_decode import flash_attention_decode_quant

    B, S, h, kvh, hd, pos = 1, 96, 4, 4, 128, 50
    key = jax.random.PRNGKey(11)
    cache = _filled_cache(key, B, S, kvh, hd, pos, quantized=True)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, h, hd))
    kc, vc = _cache_kv(cache, kvh)  # dequantized jnp view = the oracle
    want = np.asarray(
        _decode_attention_math(q, kc, vc, jnp.int32(pos), hd)
    )
    got = np.asarray(
        flash_attention_decode_quant(
            q[:, 0], cache["kv"], cache["kv_scale"], jnp.int32(pos),
            block_kv=32,
        )
    ).reshape(B, 1, -1)
    # kernel scales p by v_scale pre-cast vs jnp's dequantized-V operand:
    # same math, different rounding point — tolerance covers it
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_decode_step_use_flash_matches_jnp(key):
    """attention_decode_step(use_flash=True) == the jnp path, through the
    real serving entry (fused QKV + cache write + out-proj)."""
    cfg = TernaryAttentionConfig(d_model=256, n_heads=2)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    B, T = 1, 8
    x = rng.rand_dense(jax.random.PRNGKey(3), (B, T, 256))
    c1 = init_kv_cache(cfg, B, max_len=T)
    c2 = init_kv_cache(cfg, B, max_len=T)
    for t in range(T):
        y1, c1 = attention_decode_step(
            packed, x[:, t : t + 1], c1, cfg, use_kernel=False
        )
        y2, c2 = attention_decode_step(
            packed, x[:, t : t + 1], c2, cfg, use_kernel=False,
            use_flash=True,
        )
        # flash pre-folds sm_scale*log2e into q (one extra f32 rounding of
        # q vs the jnp path's score-side scaling) — tolerance sits between
        # that ~1 ulp path difference and the reference's dense-baseline
        # tolerance (1e-4, /root/reference/dense/dense.c:42-59; its
        # primary EPS is 1e-6, /root/reference/main.cpp:17)
        np.testing.assert_allclose(
            np.asarray(y2), np.asarray(y1), atol=1e-4, rtol=1e-5,
            err_msg=f"step {t}",
        )


def test_generate_use_flash_decode_matches_plain():
    """generate(use_flash=True) routes decode steps through the kernel
    (interpret mode here) and reproduces plain greedy token-for-token,
    including with the int8 cache."""
    from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=1, d_ff=128, n_layers=1, max_len=24,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab)
    ref = np.asarray(generate(packed, toks, cfg, 6, use_kernel=False))
    got = np.asarray(
        generate(packed, toks, cfg, 6, use_kernel=False, use_flash=True)
    )
    np.testing.assert_array_equal(got, ref)
    got8 = np.asarray(
        generate(
            packed, toks, cfg, 6, use_kernel=False, use_flash=True,
            kv_quant=True,
        )
    )
    assert got8.shape == ref.shape  # int8 cache: shape/sanity (values
    # differ from the exact path by quantization design)


def test_flash_decode_rejects_bad_head_dim():
    q = jnp.zeros((1, 4, 64))
    kc = jnp.zeros((1, 16, 256))  # flat cache, head_dim 64 not 128-aligned
    with pytest.raises(ValueError, match="head_dim"):
        flash_attention_decode(q, kc, kc, jnp.int32(0))


def test_flash_decode_rejects_integer_compute_dtype():
    # the sm_scale*log2e fold would round q to ~0 under an int dtype
    q = jnp.zeros((1, 4, 128))
    kc = jnp.zeros((1, 16, 512))
    with pytest.raises(ValueError, match="floating"):
        flash_attention_decode(
            q, kc, kc, jnp.int32(0), compute_dtype=jnp.int8
        )


# ---- C>1 chunk kernel (verify/extend path) ----


@pytest.mark.parametrize("h,kvh,window", [(4, 4, None), (8, 2, None), (4, 2, 16)])
def test_flash_chunk_matches_oracle(h, kvh, window):
    from smmb_tpu.kernels.flash_decode import flash_attention_chunk
    from smmb_tpu.models.attention import _chunk_attention_math

    B, S, hd, pos, C = 2, 96, 128, 37, 5
    key = jax.random.PRNGKey(h * 10 + (window or 0))
    cache = _filled_cache(key, B, S, kvh, hd, pos + C)  # rows pos..pos+C-1
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, C, h, hd))
    kc, vc = _cache_kv(cache, kvh)
    want = np.asarray(
        _chunk_attention_math(q, kc, vc, jnp.int32(pos), hd, window=window)
    )
    got = np.asarray(
        flash_attention_chunk(
            q, cache["k"], cache["v"], jnp.int32(pos), window=window,
            block_kv=32,
        )
    ).reshape(B, C, -1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_flash_chunk_int8_matches_oracle():
    from smmb_tpu.kernels.flash_decode import flash_attention_chunk
    from smmb_tpu.models.attention import _chunk_attention_math

    B, S, h, kvh, hd, pos, C = 1, 96, 4, 4, 128, 20, 4
    key = jax.random.PRNGKey(3)
    cache = _filled_cache(key, B, S, kvh, hd, pos + C, quantized=True)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, C, h, hd))
    kc, vc = _cache_kv(cache, kvh)
    want = np.asarray(
        _chunk_attention_math(q, kc, vc, jnp.int32(pos), hd)
    )
    from smmb_tpu.kernels.flash_decode import flash_attention_chunk_quant

    got = np.asarray(
        flash_attention_chunk_quant(
            q, cache["kv"], cache["kv_scale"], jnp.int32(pos), block_kv=32,
        )
    ).reshape(B, C, -1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_flash_chunk_rows_bitwise_match_decode():
    """The losslessness contract of speculative decoding: token c's row in
    a C-token chunk equals decoding it alone (same kernel, same tile
    order; rows are M-independent). Exact equality, no tolerance."""
    from smmb_tpu.kernels.flash_decode import flash_attention_chunk

    B, S, h, kvh, hd, C = 1, 96, 4, 2, 128, 5
    pos = 17
    key = jax.random.PRNGKey(9)
    cache = _filled_cache(key, B, S, kvh, hd, pos + C)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, C, h, hd))
    chunk_out = np.asarray(
        flash_attention_chunk(
            q, cache["k"], cache["v"], jnp.int32(pos), block_kv=32
        )
    )
    for c in range(C):
        solo = np.asarray(
            flash_attention_decode(
                q[:, c], cache["k"], cache["v"], jnp.int32(pos + c),
                block_kv=32,
            )
        )
        np.testing.assert_array_equal(chunk_out[:, c], solo, err_msg=f"row {c}")


def test_attention_extend_use_flash_matches_jnp(key):
    from smmb_tpu.models.attention import attention_extend

    cfg = TernaryAttentionConfig(d_model=256, n_heads=2)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    B, T, C = 1, 6, 3
    x = rng.rand_dense(jax.random.PRNGKey(3), (B, T + C, 256))
    c1 = init_kv_cache(cfg, B, max_len=16)
    c2 = init_kv_cache(cfg, B, max_len=16)
    for t in range(T):
        _, c1 = attention_decode_step(
            packed, x[:, t : t + 1], c1, cfg, use_kernel=False
        )
        _, c2 = attention_decode_step(
            packed, x[:, t : t + 1], c2, cfg, use_kernel=False
        )
    y1, _ = attention_extend(
        packed, x[:, T:], c1, cfg, use_kernel=False
    )
    y2, _ = attention_extend(
        packed, x[:, T:], c2, cfg, use_kernel=False, use_flash=True
    )
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y1), atol=1e-4, rtol=1e-5
    )


def test_generate_speculative_flash_equals_generate():
    """Greedy spec decode under use_flash reproduces plain greedy
    generate(use_flash=True) token-for-token (interpret-mode CPU here;
    the on-chip assertion lives in scripts/bench_spec_win.py)."""
    from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm
    from smmb_tpu.models.spec_decode import generate_speculative

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=1, d_ff=128, n_layers=1, max_len=48,
    )
    target = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    draft = pack_lm(init_lm(jax.random.PRNGKey(1), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab)
    ref = np.asarray(
        generate(target, toks, cfg, 10, use_kernel=False, use_flash=True)
    )
    got = np.asarray(
        generate_speculative(
            target, draft, toks, cfg, cfg, 10, k=4, use_kernel=False,
            use_flash=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_flash_decode_batch_rows_independent():
    """Rows of a batched call match the same rows served alone when the
    KV tile size is the same for both calls (S small enough that the
    auto-chosen tile spans the cache either way). NOTE this is a
    tile-schedule property, not a general cross-batch guarantee: a batch
    large enough to shrink the auto tile changes the accumulation order
    (measured on chip, round 4). The spec-decode contract only needs
    decode-vs-chunk identity at the SAME batch/config, which
    test_flash_chunk_rows_bitwise_match_decode covers."""
    from smmb_tpu.kernels.flash_decode import flash_attention_decode

    B, S, kvh, hd, pos = 4, 256, 2, 128, 199
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (B, 4, hd), jnp.bfloat16)
    kc = jax.random.normal(kk, (B, S, kvh * hd), jnp.bfloat16)
    vc = jax.random.normal(kv, (B, S, kvh * hd), jnp.bfloat16)
    batched = np.asarray(flash_attention_decode(q, kc, vc, pos))
    for r in range(B):
        row = np.asarray(
            flash_attention_decode(
                q[r : r + 1], kc[r : r + 1], vc[r : r + 1], pos
            )
        )
        np.testing.assert_array_equal(batched[r], row[0])


def test_flash_chunk_vmem_gate():
    """Oversized chunks must be refused by the kernel (its (C·H, ·) VMEM
    scratch cannot shrink with the cache tile) and routed to the jnp path
    by the extend gate (ADVICE r4)."""
    from smmb_tpu.kernels.flash_decode import (
        flash_attention_chunk,
        flash_chunk_rows_ok,
    )

    # serving-sized chunks fit; a C=2048 × H=32 chunk does not
    assert flash_chunk_rows_ok(1, 8, 128, 1024, 2)
    assert flash_chunk_rows_ok(64, 8, 128, 1024, 2)
    assert not flash_chunk_rows_ok(2048, 32, 128, 4096, 2)

    q = jax.ShapeDtypeStruct((1, 2048, 32, 128), jnp.float32)
    kc = jax.ShapeDtypeStruct((1, 256, 32 * 128), jnp.float32)
    with pytest.raises(ValueError, match="too large"):
        jax.eval_shape(
            lambda q, kc: flash_attention_chunk(q, kc, kc, jnp.int32(0)),
            q, kc,
        )
