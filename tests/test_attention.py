"""Ternary attention block tests: serving parity vs dense oracle, masking,
QAT gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _attention_math,
    attention_forward,
    init_attention,
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
