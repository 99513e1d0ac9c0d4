"""Tensor-parallel transformer block / LM parity on the virtual CPU mesh.

Contract (as for the MLP pairing in test_parallel.py): the TP-sharded
forward equals the single-device forward within dense-accumulation
tolerance, for both the jnp parity path and the Pallas kernel path
(interpret mode on CPU), across mesh layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm
from smmb_tpu.models.transformer import (
    TernaryBlockConfig,
    block_forward,
    init_block,
    pack_block,
)
from smmb_tpu.parallel import make_mesh
from smmb_tpu.parallel.tp_transformer import (
    block_decode_step_tp,
    block_forward_tp,
    block_prefill_tp,
    generate_tp,
    init_block_cache_tp,
    lm_decode_step_tp,
    lm_forward_tp,
    lm_init_cache_tp,
    lm_prefill_tp,
    shard_block_tp,
    shard_lm_tp,
)
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close

# d_model and d_ff must be multiples of 512*model for the row-sharded
# contractions (packed-group alignment); n_heads % model == 0.
CFG = TernaryBlockConfig(d_model=1024, n_heads=4, d_ff=1024)


def _assert_scaled(y, ref, what):
    # psum reduction order differs from the single-device k-tile loop;
    # block outputs reach ~1e3 magnitude, so the abs tolerance scales
    # (~2e-5 relative — well inside the reference's 1e-4 contract)
    tol = max(TOL_DENSE, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    assert_close(y, ref, tol, what)


def _setup_block(seed=0, batch=4, t=6):
    params = init_block(jax.random.PRNGKey(seed), CFG)
    packed = pack_block(params)
    x = rng.rand_dense(jax.random.PRNGKey(seed + 1), (batch, t, CFG.d_model))
    return packed, x * 0.1


@pytest.mark.parametrize("data,model", [(2, 2), (4, 2), (1, 2)])
def test_block_tp_matches_single(data, model):
    mesh = make_mesh(data, model, devices=jax.devices()[: data * model])
    packed, x = _setup_block(11)
    ref = np.asarray(block_forward(packed, x, CFG, use_kernel=False))
    sharded = shard_block_tp(packed, mesh)
    y = block_forward_tp(sharded, x, CFG, mesh=mesh, use_kernel=False)
    _assert_scaled(y, ref, "block tp")


def test_block_tp_kernel_path():
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    packed, x = _setup_block(13, batch=2, t=2)
    ref = np.asarray(block_forward(packed, x, CFG, use_kernel=False))
    sharded = shard_block_tp(packed, mesh)
    y = block_forward_tp(sharded, x, CFG, mesh=mesh, use_kernel=True)
    _assert_scaled(y, ref, "block tp kernel")


def test_block_tp_quantized_scales():
    # QAT pack: non-trivial per-projection scales must survive sharding
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    params = init_block(jax.random.PRNGKey(7), CFG)
    params = jax.tree.map(lambda a: a + 0.01, params)
    packed = pack_block(params, quantize=True)
    packed, x = packed, _setup_block(7)[1]
    ref = np.asarray(block_forward(packed, x, CFG, use_kernel=False))
    sharded = shard_block_tp(packed, mesh)
    y = block_forward_tp(sharded, x, CFG, mesh=mesh, use_kernel=False)
    _assert_scaled(y, ref, "block tp qat")


def test_block_tp_rejects_bad_heads():
    mesh = make_mesh(1, 8)
    packed, x = _setup_block(5)
    sharded_err = pytest.raises(ValueError)
    with sharded_err:
        # n_heads=4 not divisible by model=8 (shard_block_tp's column
        # partitioner would also reject d_model=1024 over 8 shards)
        shard_block_tp(packed, mesh)


LM_CFG = TernaryLMConfig(
    vocab=512, d_model=1024, n_heads=4, d_ff=1024, n_layers=2, max_len=32
)


def test_lm_tp_matches_single():
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    params = init_lm(jax.random.PRNGKey(21), LM_CFG)
    packed = pack_lm(params)
    toks = jax.random.randint(
        jax.random.PRNGKey(22), (2, 6), 0, LM_CFG.vocab
    )
    ref = np.asarray(lm_forward(packed, toks, LM_CFG, use_kernel=False))
    sharded = shard_lm_tp(packed, mesh)
    y = lm_forward_tp(sharded, toks, LM_CFG, mesh=mesh, use_kernel=False)
    _assert_scaled(y, ref, "lm tp")


def test_block_tp_gqa_matches_single():
    # GQA under TP: each shard's query heads group over exactly its own
    # KV heads; kv_dim=4*256=1024 keeps the column shards 128-aligned
    import dataclasses as dc

    cfg = dc.replace(CFG, n_kv_heads=2)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    params = init_block(jax.random.PRNGKey(91), cfg)
    packed = pack_block(params)
    x = rng.rand_dense(jax.random.PRNGKey(92), (2, 4, cfg.d_model)) * 0.1
    ref = np.asarray(block_forward(packed, x, cfg, use_kernel=False))
    sharded = shard_block_tp(packed, mesh)
    y = block_forward_tp(sharded, x, cfg, mesh=mesh, use_kernel=False)
    _assert_scaled(y, ref, "block tp gqa")


def test_block_decode_tp_gqa_matches_forward():
    import dataclasses as dc

    cfg = dc.replace(CFG, n_kv_heads=2)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    params = init_block(jax.random.PRNGKey(93), cfg)
    packed = pack_block(params)
    x = rng.rand_dense(jax.random.PRNGKey(94), (2, 5, cfg.d_model)) * 0.1
    sharded = shard_block_tp(packed, mesh)
    full = np.asarray(
        block_forward_tp(sharded, x, cfg, mesh=mesh, use_kernel=False)
    )
    cache = init_block_cache_tp(cfg, batch=2, max_len=8, mesh=mesh)
    assert cache["k"].shape == (2, 8, 512)  # flat: kv_heads*hd
    _, cache = block_prefill_tp(
        sharded, x[:, :-1], cache, cfg, mesh=mesh, use_kernel=False
    )
    y_t, _ = block_decode_step_tp(
        sharded, x[:, -1:], cache, cfg, mesh=mesh, use_kernel=False
    )
    _assert_scaled(y_t[:, 0], full[:, -1], "tp gqa decode")


def test_block_decode_tp_matches_forward():
    # TP prefill T-1 tokens then one TP decode step == TP full forward's
    # last position (head-sharded cache correctness)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    packed, x = _setup_block(31, batch=2, t=5)
    sharded = shard_block_tp(packed, mesh)
    full = np.asarray(
        block_forward_tp(sharded, x, CFG, mesh=mesh, use_kernel=False)
    )
    cache = init_block_cache_tp(CFG, batch=2, max_len=8, mesh=mesh)
    _, cache = block_prefill_tp(
        sharded, x[:, :-1], cache, CFG, mesh=mesh, use_kernel=False
    )
    y_t, _ = block_decode_step_tp(
        sharded, x[:, -1:], cache, CFG, mesh=mesh, use_kernel=False
    )
    _assert_scaled(y_t[:, 0], full[:, -1], "tp decode")


def test_lm_decode_tp_matches_single():
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    params = init_lm(jax.random.PRNGKey(41), LM_CFG)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(42), (2, 5), 0, LM_CFG.vocab)
    ref = np.asarray(lm_forward(packed, toks, LM_CFG, use_kernel=False))
    sharded = shard_lm_tp(packed, mesh)
    cache = lm_init_cache_tp(LM_CFG, batch=2, mesh=mesh)
    _, cache = lm_prefill_tp(
        sharded, toks[:, :-1], cache, LM_CFG, mesh=mesh, use_kernel=False
    )
    logits, _ = lm_decode_step_tp(
        sharded, toks[:, -1], cache, LM_CFG, mesh=mesh, use_kernel=False
    )
    _assert_scaled(logits, ref[:, -1], "lm tp decode")


def test_generate_tp_matches_single():
    from smmb_tpu.models.lm import generate

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    params = init_lm(jax.random.PRNGKey(51), LM_CFG)
    packed = pack_lm(params)
    toks = jax.random.randint(jax.random.PRNGKey(52), (2, 4), 0, LM_CFG.vocab)
    want = np.asarray(generate(packed, toks, LM_CFG, 4, use_kernel=False))
    sharded = shard_lm_tp(packed, mesh)
    got = np.asarray(
        generate_tp(sharded, toks, LM_CFG, 4, mesh=mesh, use_kernel=False)
    )
    np.testing.assert_array_equal(got, want)


def test_block_tp_flash_matches_single():
    """use_flash under TP: shard-local flash attention (heads split over
    model) equals the single-device einsum forward."""
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    packed, x = _setup_block(17)
    ref = np.asarray(block_forward(packed, x, CFG, use_kernel=False))
    sharded = shard_block_tp(packed, mesh)
    y = block_forward_tp(
        sharded, x, CFG, mesh=mesh, use_kernel=False, use_flash=True
    )
    _assert_scaled(y, ref, "block tp flash")


def test_generate_tp_flash_matches_plain():
    """generate_tp(use_flash=True) produces identical tokens (flash is
    prefill-only; greedy decode unchanged)."""
    cfg = TernaryLMConfig(
        vocab=256, d_model=1024, n_heads=4, d_ff=1024, n_layers=1, max_len=32
    )
    params = init_lm(jax.random.PRNGKey(23), cfg)
    packed = pack_lm(params)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_lm_tp(packed, mesh)
    toks = jax.random.randint(jax.random.PRNGKey(24), (2, 8), 0, cfg.vocab)
    g0 = generate_tp(sharded, toks, cfg, 6, mesh=mesh, use_kernel=False)
    g1 = generate_tp(
        sharded, toks, cfg, 6, mesh=mesh, use_kernel=False, use_flash=True
    )
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_generate_tp_kv_quant_runs():
    """int8 KV caches through the TP decode path (head-sharded codes +
    scales, quantize/dequant via the shared attention helpers)."""
    cfg = TernaryLMConfig(
        vocab=256, d_model=1024, n_heads=4, d_ff=1024, n_layers=1, max_len=32
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(33), cfg))
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_lm_tp(packed, mesh)
    toks = jax.random.randint(jax.random.PRNGKey(34), (2, 8), 0, cfg.vocab)
    out = generate_tp(
        sharded, toks, cfg, 6, mesh=mesh, use_kernel=False, kv_quant=True
    )
    assert out.shape == (2, 6)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < cfg.vocab))
    # quantized TP cache really is int8 + sharded scales
    from smmb_tpu.parallel.tp_transformer import lm_init_cache_tp

    cache = lm_init_cache_tp(cfg, 2, mesh, quantized=True)
    assert cache[0]["kv"].dtype == jnp.int8
    assert "kv_scale" in cache[0]


def test_generate_tp_ragged_matches_per_row():
    """generate_tp(prompt_mask=...) serves a left-padded ragged batch under
    TP: each row equals its own unpadded single-device greedy continuation
    (VERDICT r4 #2 — ragged batches through TP decode)."""
    from smmb_tpu.models.lm import generate

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    packed = pack_lm(init_lm(jax.random.PRNGKey(61), LM_CFG))
    k1, k2 = jax.random.split(jax.random.PRNGKey(62))
    p1 = jax.random.randint(k1, (1, 3), 0, LM_CFG.vocab)
    p2 = jax.random.randint(k2, (1, 6), 0, LM_CFG.vocab)
    t = 6
    batch = jnp.concatenate(
        [jnp.pad(p1, ((0, 0), (t - 3, 0))), p2]
    )
    mask = jnp.stack([
        jnp.arange(t) >= (t - 3),
        jnp.ones((t,), bool),
    ])
    refs = [
        np.asarray(generate(packed, p, LM_CFG, 5, use_kernel=False))
        for p in (p1, p2)
    ]
    sharded = shard_lm_tp(packed, mesh)
    got = np.asarray(
        generate_tp(
            sharded, batch, LM_CFG, 5, mesh=mesh, use_kernel=False,
            prompt_mask=mask,
        )
    )
    for r, ref in enumerate(refs):
        np.testing.assert_array_equal(got[r], ref[0], err_msg=f"row {r}")
