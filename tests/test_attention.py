"""Ternary attention block tests: serving parity vs dense oracle, masking,
QAT gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _attention_math,
    attention_decode_step,
    attention_forward,
    attention_prefill,
    init_attention,
    init_kv_cache,
    pack_attention,
    qat_attention_forward,
)
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import assert_close


def _dense_oracle(params, x, cfg):
    def proj(name, inp):
        return (
            jnp.dot(
                inp,
                params[name],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + params[name.replace("w", "b")]
        )

    q, k, v = proj("wq", x), proj("wk", x), proj("wv", x)
    return proj("wo", _attention_math(q, k, v, cfg))


def test_attention_serving_parity(key):
    cfg = TernaryAttentionConfig(d_model=128, n_heads=4)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    x = rng.rand_dense(jax.random.PRNGKey(1), (2, 16, 128))
    y = attention_forward(packed, x, cfg, use_kernel=False)
    ref = _dense_oracle(params, x, cfg)
    tol = max(1e-4, 2e-6 * float(jnp.abs(ref).max()))
    assert_close(y, ref, tol, "attention serving vs dense")


def test_attention_causal_mask(key):
    cfg = TernaryAttentionConfig(d_model=64, n_heads=2, causal=True)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    x = rng.rand_dense(jax.random.PRNGKey(2), (1, 8, 64))
    y_full = attention_forward(packed, x, cfg, use_kernel=False)
    # causal: outputs at position t must not change when the future changes
    x2 = x.at[0, 5:].set(0.0)
    y_cut = attention_forward(packed, x2, cfg, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(y_full[0, :5]), np.asarray(y_cut[0, :5]), atol=1e-5
    )


def test_attention_non_causal_differs(key):
    cfg = TernaryAttentionConfig(d_model=64, n_heads=2, causal=False)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    x = rng.rand_dense(jax.random.PRNGKey(3), (1, 8, 64))
    y = attention_forward(packed, x, cfg, use_kernel=False)
    x2 = x.at[0, 7].set(0.0)
    y2 = attention_forward(packed, x2, cfg, use_kernel=False)
    # without causal masking, changing the last position affects earlier rows
    assert float(np.abs(np.asarray(y[0, 0]) - np.asarray(y2[0, 0])).max()) > 0


def test_attention_qat_gradients(key):
    cfg = TernaryAttentionConfig(d_model=32, n_heads=2)
    params = init_attention(key, cfg)
    params = {k_: v + 0.01 for k_, v in params.items()}
    x = rng.rand_dense(jax.random.PRNGKey(4), (2, 4, 32))

    def loss(p):
        return jnp.sum(qat_attention_forward(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_attention_dim_validation(key):
    import pytest

    cfg = TernaryAttentionConfig(d_model=65, n_heads=2)
    with pytest.raises(ValueError):
        init_attention(key, cfg)


# ---------------------------------------------------------------- block


def test_transformer_block_forward(key):
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_forward,
        init_block,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=64, n_heads=2, d_ff=128)
    params = init_block(key, cfg)
    packed = pack_block(params)
    x = rng.rand_dense(jax.random.PRNGKey(11), (2, 8, 64))
    y = block_forward(packed, x, cfg, use_kernel=False)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
    # residual path: zeroed weights ≈ identity (plus bias-driven terms)
    # sanity: output differs from input (block actually did something)
    assert float(np.abs(np.asarray(y - x)).max()) > 0.1


def test_transformer_block_causality(key):
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_forward,
        init_block,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=64, n_heads=2, d_ff=128, causal=True)
    packed = pack_block(init_block(key, cfg))
    x = rng.rand_dense(jax.random.PRNGKey(12), (1, 8, 64))
    y1 = block_forward(packed, x, cfg, use_kernel=False)
    x2 = x.at[0, 6:].set(0.0)
    y2 = block_forward(packed, x2, cfg, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(y1[0, :6]), np.asarray(y2[0, :6]), atol=1e-4
    )


def test_transformer_block_quantized(key):
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_forward,
        init_block,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=64, n_heads=2, d_ff=128)
    params = init_block(key, cfg)
    params = {
        k_: (jax.tree.map(lambda a: a * 0.6 + 0.01, v) if k_ == "attn"
             else v * 0.6 + 0.01 if k_.startswith("w") else v)
        for k_, v in params.items()
    }
    packed = pack_block(params, quantize=True)
    x = rng.rand_dense(jax.random.PRNGKey(13), (1, 4, 64))
    y = block_forward(packed, x, cfg, use_kernel=False)
    assert np.all(np.isfinite(np.asarray(y)))


# ------------------------------------------------- KV-cache decode path


def test_kv_cache_decode_matches_full_forward(key):
    # prefill T0 tokens, then decode the rest one-by-one; every decoded
    # output must equal the corresponding column of the full causal forward
    from smmb_tpu.models.attention import (
        attention_decode_step,
        attention_prefill,
        init_kv_cache,
    )

    cfg = TernaryAttentionConfig(d_model=128, n_heads=4)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    B, T, T0 = 2, 12, 5
    x = rng.rand_dense(jax.random.PRNGKey(2), (B, T, 128))

    full = np.asarray(attention_forward(packed, x, cfg, use_kernel=False))

    cache = init_kv_cache(cfg, B, max_len=T)
    y0, cache = attention_prefill(
        packed, x[:, :T0], cache, cfg, use_kernel=False
    )
    np.testing.assert_allclose(
        np.asarray(y0), full[:, :T0], atol=2e-4, rtol=0
    )
    assert int(cache["pos"]) == T0
    for t in range(T0, T):
        y_t, cache = attention_decode_step(
            packed, x[:, t : t + 1], cache, cfg, use_kernel=False
        )
        np.testing.assert_allclose(
            np.asarray(y_t)[:, 0], full[:, t], atol=2e-4, rtol=0,
            err_msg=f"decode step t={t}",
        )
    assert int(cache["pos"]) == T


def test_kv_cache_decode_jit_scan(key):
    # the decode loop must run under jit with the cache as carry
    from smmb_tpu.models.attention import (
        attention_decode_step,
        init_kv_cache,
    )

    cfg = TernaryAttentionConfig(d_model=64, n_heads=2)
    params = init_attention(key, cfg)
    packed = pack_attention(params)
    B, T = 1, 6
    x = rng.rand_dense(jax.random.PRNGKey(3), (B, T, 64))

    @jax.jit
    def decode_all(packed, x):
        cache = init_kv_cache(cfg, B, max_len=T)

        def step(cache, x_t):
            y, cache = attention_decode_step(
                packed, x_t[:, None], cache, cfg, use_kernel=False
            )
            return cache, y[:, 0]

        cache, ys = jax.lax.scan(step, cache, x.swapaxes(0, 1))
        return ys.swapaxes(0, 1)

    ys = np.asarray(decode_all(packed, x))
    full = np.asarray(attention_forward(packed, x, cfg, use_kernel=False))
    np.testing.assert_allclose(ys, full, atol=2e-4, rtol=0)


def test_block_decode_matches_forward(key):
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_decode_step,
        block_forward,
        block_prefill,
        init_block,
        init_block_cache,
        pack_block,
    )

    cfg = TernaryBlockConfig(d_model=64, n_heads=2, d_ff=128)
    params = init_block(key, cfg)
    packed = pack_block(params)
    B, T, T0 = 1, 8, 3
    x = rng.rand_dense(jax.random.PRNGKey(4), (B, T, 64))
    full = np.asarray(block_forward(packed, x, cfg, use_kernel=False))

    cache = init_block_cache(cfg, B, max_len=T)
    y0, cache = block_prefill(packed, x[:, :T0], cache, cfg, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y0), full[:, :T0], atol=3e-4, rtol=0)
    for t in range(T0, T):
        y_t, cache = block_decode_step(
            packed, x[:, t : t + 1], cache, cfg, use_kernel=False
        )
        np.testing.assert_allclose(
            np.asarray(y_t)[:, 0], full[:, t], atol=3e-4, rtol=0,
            err_msg=f"block decode t={t}",
        )


def test_decode_step_rejects_multi_token(key):
    import pytest

    from smmb_tpu.models.attention import (
        attention_decode_step,
        init_kv_cache,
    )

    cfg = TernaryAttentionConfig(d_model=64, n_heads=2)
    packed = pack_attention(init_attention(key, cfg))
    cache = init_kv_cache(cfg, 1, 8)
    x2 = rng.rand_dense(jax.random.PRNGKey(5), (1, 2, 64))
    with pytest.raises(ValueError):
        attention_decode_step(packed, x2, cache, cfg, use_kernel=False)


class TestGQA:
    """Grouped-query attention: n_kv_heads < n_heads."""

    CFG = TernaryAttentionConfig(d_model=256, n_heads=8, n_kv_heads=2)

    def _setup(self, seed=0):
        params = init_attention(jax.random.PRNGKey(seed), self.CFG)
        packed = pack_attention(params)
        x = rng.rand_dense(jax.random.PRNGKey(seed + 1), (2, 6, 256)) * 0.5
        return params, packed, x

    def test_shapes(self):
        params, _, _ = self._setup()
        assert params["wk"].shape == (256, 64)  # kv_dim = 2 * 32
        assert params["wq"].shape == (256, 256)
        cache = init_kv_cache(self.CFG, batch=2, max_len=8)
        # flat serving layout: kv_heads · head_dim fused (= 2 · 32)
        assert cache["k"].shape == (2, 8, 64)

    def test_forward_matches_repeated_mha(self):
        # oracle: materialize the repeated K/V projections as an MHA layer
        import dataclasses as dc

        params, packed, x = self._setup(3)
        y = attention_forward(packed, x, self.CFG, use_kernel=False)
        group = self.CFG.n_heads // self.CFG.kv_heads
        hd = self.CFG.head_dim

        def widen(w):  # (D, KVH*hd) -> (D, H*hd) repeating per head
            return np.repeat(
                np.asarray(w).reshape(-1, self.CFG.kv_heads, hd),
                group, axis=1,
            ).reshape(np.asarray(w).shape[0], -1)

        def widen_b(b):
            return np.repeat(
                np.asarray(b).reshape(self.CFG.kv_heads, hd), group, axis=0
            ).reshape(-1)

        mha_params = dict(params)
        mha_params["wk"] = jnp.asarray(widen(params["wk"]))
        mha_params["bk"] = jnp.asarray(widen_b(params["bk"]))
        mha_params["wv"] = jnp.asarray(widen(params["wv"]))
        mha_params["bv"] = jnp.asarray(widen_b(params["bv"]))
        mha_cfg = dc.replace(self.CFG, n_kv_heads=None)
        ref = attention_forward(
            pack_attention(mha_params), x, mha_cfg, use_kernel=False
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), atol=2e-4, rtol=0
        )

    def test_decode_matches_forward(self):
        _, packed, x = self._setup(5)
        HI = jax.lax.Precision.HIGHEST
        full = attention_forward(
            packed, x, self.CFG, use_kernel=False, precision=HI
        )
        cache = init_kv_cache(self.CFG, batch=2, max_len=8)
        _, cache = attention_prefill(
            packed, x[:, :-1], cache, self.CFG, use_kernel=False, precision=HI
        )
        y_t, cache = attention_decode_step(
            packed, x[:, -1:], cache, self.CFG, use_kernel=False, precision=HI
        )
        np.testing.assert_allclose(
            np.asarray(y_t[:, 0]), np.asarray(full[:, -1]), atol=2e-4, rtol=0
        )
        assert int(cache["pos"]) == x.shape[1]

    def test_rejects_bad_kv_heads(self):
        import pytest

        cfg = TernaryAttentionConfig(d_model=256, n_heads=8, n_kv_heads=3)
        with pytest.raises(ValueError):
            init_attention(jax.random.PRNGKey(0), cfg)


def test_chunked_attention_matches_full():
    """Memory-efficient scan attention == einsum math (fwd), incl. GQA,
    rope, and sliding window."""
    import dataclasses

    from smmb_tpu.models.attention import (
        attention_math_chunked, _attention_math,
    )

    HI = jax.lax.Precision.HIGHEST
    for kwargs in (
        dict(),
        dict(n_kv_heads=2),
        dict(rope=True),
        dict(window=40),
        dict(causal=False),
    ):
        cfg = TernaryAttentionConfig(d_model=4 * 32, n_heads=4, **kwargs)
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(kq, (2, 128, cfg.d_model))
        k = jax.random.normal(kk, (2, 128, cfg.kv_dim))
        v = jax.random.normal(kv, (2, 128, cfg.kv_dim))
        want = _attention_math(q, k, v, cfg, precision=HI)
        got = attention_math_chunked(q, k, v, cfg, chunk=32, precision=HI)
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 1e-5, (kwargs, err)


def test_chunked_attention_gradients_match():
    """Autodiff through the checkpointed scan equals full-path grads."""
    from smmb_tpu.models.attention import (
        attention_math_chunked, _attention_math,
    )

    HI = jax.lax.Precision.HIGHEST
    cfg = TernaryAttentionConfig(d_model=2 * 32, n_heads=2, n_kv_heads=1)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(kq, (1, 64, 64))
    k = jax.random.normal(kk, (1, 64, 32))
    v = jax.random.normal(kv, (1, 64, 32))

    def loss_full(q, k, v):
        return jnp.sum(_attention_math(q, k, v, cfg, precision=HI) ** 2)

    def loss_chunk(q, k, v):
        return jnp.sum(
            attention_math_chunked(q, k, v, cfg, chunk=16, precision=HI) ** 2
        )

    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    gc = jax.grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_qat_train_step_with_chunked_attention():
    from smmb_tpu.models.lm import (
        TernaryLMConfig, init_lm, make_lm_train_step,
    )

    cfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=32
    )
    params = init_lm(jax.random.PRNGKey(13), cfg)
    params = jax.tree.map(lambda a: a + 0.01, params)
    toks = jax.random.randint(jax.random.PRNGKey(14), (2, 32), 0, cfg.vocab)
    init_opt, step = make_lm_train_step(
        cfg, learning_rate=1e-2, attn_chunk=8
    )
    opt = init_opt(params)
    jstep = jax.jit(step)
    losses = []
    for _ in range(6):
        params, opt, loss = jstep(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
