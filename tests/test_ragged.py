"""Ragged (left-padded) batch serving.

Contract: each row of a left-padded ragged batch generates exactly the
tokens it would generate as an unpadded batch-1 prompt — pads are
invisible (masked from attention, skipped in positional indexing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_init_cache,
    lm_prefill,
    pack_lm,
)

CFG = TernaryLMConfig(
    vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=48
)


def _padded_batch(prompts, t_pad, pad_tok=0):
    """Left-pad a list of (1, L_i) prompts to (N, t_pad) + mask."""
    rows, masks = [], []
    for p in prompts:
        pad = t_pad - p.shape[1]
        rows.append(
            jnp.concatenate(
                [jnp.full((1, pad), pad_tok, p.dtype), p], axis=1
            )
        )
        masks.append(
            jnp.concatenate(
                [jnp.zeros((1, pad), bool), jnp.ones((1, p.shape[1]), bool)],
                axis=1,
            )
        )
    return jnp.concatenate(rows), jnp.concatenate(masks)


@pytest.mark.parametrize("rope", [False, True])
def test_ragged_generate_matches_per_row(rope):
    import dataclasses

    cfg = dataclasses.replace(CFG, rope=rope)
    packed = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    prompts = [
        jax.random.randint(k1, (1, 5), 0, cfg.vocab),
        jax.random.randint(k2, (1, 12), 0, cfg.vocab),
        jax.random.randint(k3, (1, 9), 0, cfg.vocab),
    ]
    # per-row references: unpadded batch-1 greedy
    refs = [
        np.asarray(generate(packed, p, cfg, steps=8, use_kernel=False))
        for p in prompts
    ]
    batch, mask = _padded_batch(prompts, 12)
    got = np.asarray(
        generate(
            packed, batch, cfg, steps=8, use_kernel=False, prompt_mask=mask
        )
    )
    for r, ref in enumerate(refs):
        np.testing.assert_array_equal(got[r], ref[0], err_msg=f"row {r}")


def test_ragged_prefill_logits_match_per_row():
    """Last-position prefill logits equal each row's unpadded logits."""
    HI = jax.lax.Precision.HIGHEST
    packed = pack_lm(init_lm(jax.random.PRNGKey(2), CFG))
    ka, kb = jax.random.split(jax.random.PRNGKey(3))
    pa = jax.random.randint(ka, (1, 4), 0, CFG.vocab)
    pb = jax.random.randint(kb, (1, 10), 0, CFG.vocab)

    la, _ = lm_prefill(
        packed, pa, lm_init_cache(CFG, 1), CFG, use_kernel=False, precision=HI
    )
    lb, _ = lm_prefill(
        packed, pb, lm_init_cache(CFG, 1), CFG, use_kernel=False, precision=HI
    )
    batch, mask = _padded_batch([pa, pb], 10)
    lr, cache = lm_prefill(
        packed, batch, lm_init_cache(CFG, 2, ragged=True), CFG,
        use_kernel=False, precision=HI, prompt_mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(lr[0]), np.asarray(la[0]), atol=5e-4, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(lr[1]), np.asarray(lb[0]), atol=5e-4, rtol=0
    )
    # pad slots are marked invalid in the cache
    assert not bool(cache[0]["valid"][0, :6].any())
    assert bool(cache[0]["valid"][0, 6:10].all())
    assert not bool(cache[0]["valid"][:, 10:].any())  # unwritten tail


def test_ragged_composes_with_kv_quant():
    packed = pack_lm(init_lm(jax.random.PRNGKey(4), CFG))
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    prompts = [
        jax.random.randint(ka, (1, 3), 0, CFG.vocab),
        jax.random.randint(kb, (1, 8), 0, CFG.vocab),
    ]
    batch, mask = _padded_batch(prompts, 8)
    out = generate(
        packed, batch, CFG, steps=6, use_kernel=False,
        prompt_mask=mask, kv_quant=True,
    )
    assert out.shape == (2, 6)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < CFG.vocab))
