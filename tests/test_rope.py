"""Rotary position embeddings across the serving stack.

Contracts: (1) RoPE scores depend only on relative offset; (2) the
KV-cache paths (decode, chunked prefill, TP decode) store roped keys and
reproduce the full roped forward; (3) SP ring ropes at global positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.attention import apply_rope
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
    n_kv_heads=1, rope=True,
)


def _lm(seed=90):
    params = init_lm(jax.random.PRNGKey(seed), CFG)
    return pack_lm(params)


def test_rope_relative_position_invariance():
    """<rope(q,i), rope(k,j)> depends only on i-j (orthogonal rotations)."""
    kq, kk = jax.random.split(jax.random.PRNGKey(0))
    q = jax.random.normal(kq, (1, 1, 1, 64))
    k = jax.random.normal(kk, (1, 1, 1, 64))

    def score(i, j):
        qi = apply_rope(q, jnp.asarray([i]))
        kj = apply_rope(k, jnp.asarray([j]))
        return float(jnp.sum(qi * kj))

    np.testing.assert_allclose(score(3, 1), score(10, 8), rtol=1e-5)
    np.testing.assert_allclose(score(5, 5), float(jnp.sum(q * k)), rtol=1e-5)
    # norms preserved
    np.testing.assert_allclose(
        float(jnp.sum(apply_rope(q, jnp.asarray([7])) ** 2)),
        float(jnp.sum(q ** 2)),
        rtol=1e-5,
    )


def test_rope_odd_head_dim_rejected():
    with pytest.raises(ValueError, match="even"):
        apply_rope(jnp.zeros((1, 1, 1, 3)), jnp.asarray([0]))


def test_rope_changes_output():
    """rope=True actually alters the forward (guard against silent no-op)."""
    packed = _lm()
    toks = jax.random.randint(jax.random.PRNGKey(91), (1, 8), 0, CFG.vocab)
    import dataclasses

    y_rope = lm_forward(packed, toks, CFG, use_kernel=False, precision=HI)
    y_plain = lm_forward(
        packed, toks, dataclasses.replace(CFG, rope=False),
        use_kernel=False, precision=HI,
    )
    assert float(jnp.max(jnp.abs(y_rope - y_plain))) > 1e-3


def test_rope_decode_matches_forward():
    """Prefill + decode steps reproduce the full roped forward logits."""
    packed = _lm()
    toks = jax.random.randint(jax.random.PRNGKey(92), (2, 12), 0, CFG.vocab)
    full = lm_forward(packed, toks, CFG, use_kernel=False, precision=HI)

    from smmb_tpu.models.lm import lm_decode_step

    logits_p, cache = lm_prefill(
        packed, toks[:, :8], lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, 7]), atol=2e-4, rtol=0
    )
    logits = logits_p
    for i in range(8, 12):
        logits, cache = lm_decode_step(
            packed, toks[:, i], cache, CFG, use_kernel=False, precision=HI
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, i]), atol=2e-4, rtol=0,
            err_msg=f"decode step {i}",
        )


def test_rope_chunked_prefill_matches_one_shot():
    packed = _lm()
    toks = jax.random.randint(jax.random.PRNGKey(93), (2, 16), 0, CFG.vocab)
    l_ref, c_ref = lm_prefill(
        packed, toks, lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    l_ch, c_ch = lm_prefill_chunked(
        packed, toks, lm_init_cache(CFG, 2), CFG, chunk=4,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(l_ch), np.asarray(l_ref), atol=2e-4, rtol=0
    )
    for c, cr in zip(c_ch, c_ref):
        # 1e-4 abs on O(30) keys: XLA constant-folds cos/sin for the
        # one-shot path's concrete positions but computes them in f32 at
        # runtime inside the chunked scan — pure rounding skew
        np.testing.assert_allclose(
            np.asarray(c["k"]), np.asarray(cr["k"]), atol=1e-4
        )


def test_rope_generate_runs_and_flash_matches():
    packed = _lm()
    toks = jax.random.randint(jax.random.PRNGKey(94), (2, 8), 0, CFG.vocab)
    g0 = generate(packed, toks, CFG, steps=6, use_kernel=False)
    g1 = generate(packed, toks, CFG, steps=6, use_kernel=False, use_flash=True)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_rope_tp_generate_matches_single():
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import generate_tp, shard_lm_tp

    cfg = TernaryLMConfig(
        vocab=256, d_model=1024, n_heads=4, d_ff=1024, n_layers=1,
        max_len=32, rope=True,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(95), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(96), (2, 8), 0, cfg.vocab)
    ref = generate(packed, toks, cfg, steps=6, use_kernel=False)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_lm_tp(packed, mesh)
    got = generate_tp(sharded, toks, cfg, 6, mesh=mesh, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rope_sp_block_matches_single():
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig, block_forward, init_block, pack_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.sp_block import block_forward_sp

    cfg = TernaryBlockConfig(d_model=512, n_heads=4, d_ff=512, rope=True)
    packed = pack_block(init_block(jax.random.PRNGKey(97), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(98), (2, 32, 512)) * 0.1
    ref = np.asarray(
        block_forward(packed, x, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(2, 4)
    y = block_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)
