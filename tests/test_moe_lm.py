"""MoE transformer LM: the Switch/Mixtral architecture through the whole
serving stack via TernaryLMConfig(n_experts=...).

Contract: the entire serving machinery (generate, chunked prefill, beam,
speculative decode, quantized cache) is architecture-agnostic — only the
block FFN changed, and everything cache-shaped lives in attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    generate_beam,
    init_lm,
    lm_forward,
    lm_init_cache,
    lm_prefill,
    lm_prefill_chunked,
    make_lm_train_step,
    pack_lm,
)

HI = jax.lax.Precision.HIGHEST

CFG = TernaryLMConfig(
    vocab=64, d_model=128, n_heads=2, d_ff=128, n_layers=2, max_len=32,
    n_experts=4, top_k=2, n_kv_heads=1, rope=True,
)


def _lm(seed=0):
    params = init_lm(jax.random.PRNGKey(seed), CFG)
    return params, pack_lm(params)


def test_moe_lm_forward_and_block_structure():
    _, packed = _lm(1)
    assert "moe" in packed["blocks"][0]  # MoE blocks, not dense MLP
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, CFG.vocab)
    y = lm_forward(packed, toks, CFG, use_kernel=False)
    assert y.shape == (2, 8, CFG.vocab)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_moe_lm_decode_matches_forward():
    from smmb_tpu.models.lm import lm_decode_step

    _, packed = _lm(3)
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 0, CFG.vocab)
    full = lm_forward(packed, toks, CFG, use_kernel=False, precision=HI)
    logits, cache = lm_prefill(
        packed, toks[:, :6], lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 5]), atol=2e-4, rtol=0
    )
    for i in range(6, 10):
        logits, cache = lm_decode_step(
            packed, toks[:, i], cache, CFG, use_kernel=False, precision=HI
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, i]), atol=2e-4, rtol=0,
            err_msg=f"step {i}",
        )


def test_moe_lm_chunked_prefill_matches():
    _, packed = _lm(5)
    toks = jax.random.randint(jax.random.PRNGKey(6), (2, 16), 0, CFG.vocab)
    l1, _ = lm_prefill(
        packed, toks, lm_init_cache(CFG, 2), CFG,
        use_kernel=False, precision=HI,
    )
    l2, _ = lm_prefill_chunked(
        packed, toks, lm_init_cache(CFG, 2), CFG, chunk=4,
        use_kernel=False, precision=HI,
    )
    np.testing.assert_allclose(
        np.asarray(l2), np.asarray(l1), atol=2e-4, rtol=0
    )


def test_moe_lm_generate_beam_spec_kvquant():
    from smmb_tpu.models.spec_decode import generate_speculative

    _, packed = _lm(7)
    prompt = jax.random.randint(jax.random.PRNGKey(8), (1, 8), 0, CFG.vocab)
    g = generate(packed, prompt, CFG, steps=6, use_kernel=False)
    assert g.shape == (1, 6)
    gq = generate(
        packed, prompt, CFG, steps=6, use_kernel=False, kv_quant=True
    )
    assert gq.shape == (1, 6)
    b, s = generate_beam(packed, prompt, CFG, 6, beam=2, use_kernel=False)
    assert b.shape == (2, 6) and float(s[0]) >= float(s[1])

    # spec decode with a DENSE draft against the MoE target — mixed
    # architectures compose (the draft only proposes)
    dcfg = TernaryLMConfig(
        vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=32
    )
    draft = pack_lm(init_lm(jax.random.PRNGKey(9), dcfg))
    got = generate_speculative(
        packed, draft, prompt, CFG, dcfg, steps=6, k=2, use_kernel=False
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(g))


def test_moe_lm_trains_with_aux():
    params, _ = _lm(10)
    params = jax.tree.map(lambda a: a + 0.01, params)
    toks = jax.random.randint(jax.random.PRNGKey(11), (4, 12), 0, CFG.vocab)
    init_opt, step = make_lm_train_step(CFG, learning_rate=1e-2)
    opt = init_opt(params)
    jstep = jax.jit(step)
    losses = []
    for _ in range(6):
        params, opt, loss = jstep(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # trained masters pack and serve
    served = lm_forward(
        pack_lm(params, quantize=True), toks, CFG, use_kernel=False
    )
    assert bool(jnp.all(jnp.isfinite(served)))


def test_moe_lm_generate_with_chunked_prefill():
    """generate(prefill_chunk=C) matches one-shot generate (and caps the
    MoE dispatch tensor at chunk size)."""
    _, packed = _lm(12)
    prompt = jax.random.randint(jax.random.PRNGKey(13), (2, 12), 0, CFG.vocab)
    g0 = generate(packed, prompt, CFG, steps=6, use_kernel=False)
    g1 = generate(
        packed, prompt, CFG, steps=6, use_kernel=False, prefill_chunk=4
    )
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    with pytest.raises(ValueError, match="not combinable"):
        generate(
            packed, prompt, CFG, steps=6, use_kernel=False,
            prefill_chunk=4, use_flash=True,
        )


def test_moe_blocks_rejected_on_tp():
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import shard_block_tp

    _, packed = _lm(14)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="tensor-parallel"):
        shard_block_tp(packed["blocks"][0], mesh)


def test_moe_block_sp_matches_single():
    """Sequence-parallel MoE block: shard-local drop-free routing over
    each shard's tokens == the single-device block."""
    from smmb_tpu.models.moe_block import (
        TernaryMoEBlockConfig, init_moe_block, moe_block_forward,
        pack_moe_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.sp_block import block_forward_sp
    from smmb_tpu.utils import rng

    cfg = TernaryMoEBlockConfig(
        d_model=512, n_heads=4, d_ff=512, n_experts=4, top_k=2,
        n_kv_heads=2, rope=True,
    )
    packed = pack_moe_block(init_moe_block(jax.random.PRNGKey(15), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(16), (2, 32, 512)) * 0.1
    ref = np.asarray(
        moe_block_forward(packed, x, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(2, 4)
    y = block_forward_sp(
        packed, x, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_moe_lm_sp_forward_matches_single():
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.sp_block import lm_forward_sp

    cfg = TernaryLMConfig(
        vocab=128, d_model=512, n_heads=4, d_ff=512, n_layers=1, max_len=64,
        n_experts=4, top_k=2,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(17), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(18), (1, 32), 0, cfg.vocab)
    ref = np.asarray(
        lm_forward(packed, toks, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(1, 8)
    y = lm_forward_sp(
        packed, toks, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_moe_block_tp_ep_matches_single():
    """TP attention + EP experts on one mesh axis == single-device MoE
    block (drop-free routing identical on every shard; two psums)."""
    from smmb_tpu.models.moe_block import (
        TernaryMoEBlockConfig, init_moe_block, moe_block_forward,
        pack_moe_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_moe import (
        moe_block_forward_tp, shard_moe_block_tp,
    )
    from smmb_tpu.utils import rng

    cfg = TernaryMoEBlockConfig(
        d_model=1024, n_heads=4, d_ff=512, n_experts=4, top_k=2,
        n_kv_heads=2,
    )
    packed = pack_moe_block(init_moe_block(jax.random.PRNGKey(20), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(21), (2, 6, 1024)) * 0.1
    ref = np.asarray(
        moe_block_forward(packed, x, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_moe_block_tp(packed, mesh)
    y = moe_block_forward_tp(
        sharded, x, cfg, mesh=mesh, use_kernel=False, precision=HI
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_moe_block_tp_ep_kernel_path():
    from smmb_tpu.models.moe_block import (
        TernaryMoEBlockConfig, init_moe_block, moe_block_forward,
        pack_moe_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_moe import (
        moe_block_forward_tp, shard_moe_block_tp,
    )
    from smmb_tpu.utils import rng

    cfg = TernaryMoEBlockConfig(
        d_model=1024, n_heads=4, d_ff=512, n_experts=2
    )
    packed = pack_moe_block(init_moe_block(jax.random.PRNGKey(22), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(23), (1, 2, 1024)) * 0.1
    ref = np.asarray(moe_block_forward(packed, x, cfg, use_kernel=False))
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_moe_block_tp(packed, mesh)
    y = moe_block_forward_tp(sharded, x, cfg, mesh=mesh, use_kernel=True)
    tol = max(1e-3, 1e-4 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)


def test_moe_block_tp_ep_decode_matches_forward():
    """TP-EP serving decode (head-sharded cache + shard-local expert
    routing) == the full TP-EP forward at every position."""
    from smmb_tpu.models.moe_block import (
        TernaryMoEBlockConfig, init_moe_block, moe_block_forward,
        pack_moe_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_moe import (
        init_moe_block_cache_tp, moe_block_decode_step_tp,
        moe_block_prefill_tp, shard_moe_block_tp,
    )
    from smmb_tpu.utils import rng

    cfg = TernaryMoEBlockConfig(
        d_model=1024, n_heads=4, d_ff=512, n_experts=4, top_k=2,
        n_kv_heads=2, rope=True,
    )
    packed = pack_moe_block(init_moe_block(jax.random.PRNGKey(40), cfg))
    x = rng.rand_dense(jax.random.PRNGKey(41), (2, 10, 1024)) * 0.1
    ref = np.asarray(
        moe_block_forward(packed, x, cfg, use_kernel=False, precision=HI)
    )
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_moe_block_tp(packed, mesh)
    cache = init_moe_block_cache_tp(cfg, 2, 16, mesh)
    y, cache = moe_block_prefill_tp(
        sharded, x[:, :6], cache, cfg, mesh=mesh, use_kernel=False,
        precision=HI,
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(
        np.asarray(y), ref[:, :6], atol=tol, rtol=0, err_msg="prefill"
    )
    for i in range(6, 10):
        y, cache = moe_block_decode_step_tp(
            sharded, x[:, i : i + 1], cache, cfg, mesh=mesh,
            use_kernel=False, precision=HI,
        )
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), ref[:, i], atol=tol, rtol=0,
            err_msg=f"decode step {i}",
        )


def test_moe_lm_generate_tp_matches_single():
    """generate_tp over a MoE LM (TP-EP blocks dispatched by
    _tp_block_fns) == single-device greedy generate."""
    from smmb_tpu.models.lm import generate
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import generate_tp, shard_lm_tp

    cfg = TernaryLMConfig(
        vocab=512, d_model=1024, n_heads=4, d_ff=512, n_layers=2,
        max_len=32, n_experts=2, top_k=1, n_kv_heads=2,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(42), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(43), (2, 6), 0, cfg.vocab)
    ref = generate(packed, prompt, cfg, steps=5, use_kernel=False)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_lm_tp(packed, mesh)
    got = generate_tp(
        sharded, prompt, cfg, steps=5, mesh=mesh, use_kernel=False
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_moe_lm_generate_tp_kv_quant_runs():
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import generate_tp, shard_lm_tp

    cfg = TernaryLMConfig(
        vocab=512, d_model=1024, n_heads=4, d_ff=512, n_layers=1,
        max_len=32, n_experts=2, top_k=1,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(44), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(45), (2, 4), 0, cfg.vocab)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_lm_tp(packed, mesh)
    got = generate_tp(
        sharded, prompt, cfg, steps=4, mesh=mesh, use_kernel=False,
        kv_quant=True,
    )
    assert got.shape == (2, 4)
    assert bool(jnp.all((got >= 0) & (got < cfg.vocab)))


def test_tp_ep_rejects_lora():
    from smmb_tpu.models.lora import attach_lora, init_lora_lm
    from smmb_tpu.models.moe_block import (
        TernaryMoEBlockConfig, init_moe_block, pack_moe_block,
    )
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_moe import moe_block_forward_tp, shard_moe_block_tp

    cfg = TernaryMoEBlockConfig(d_model=1024, n_heads=4, d_ff=512, n_experts=2)
    packed = pack_moe_block(init_moe_block(jax.random.PRNGKey(30), cfg))
    # hand-attach an adapter entry the way attach_lora does for blocks
    adapted = dict(packed)
    adapted["attn"] = dict(packed["attn"])
    adapted["attn"]["wq_lora"] = (
        jnp.zeros((1024, 2)), jnp.zeros((2, 1024)), jnp.float32(1.0)
    )
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="TP-EP"):
        shard_moe_block_tp(adapted, mesh)
    x = jnp.zeros((1, 2, 1024))
    with pytest.raises(ValueError, match="TP-EP"):
        moe_block_forward_tp(adapted, x, cfg, mesh=mesh, use_kernel=False)
