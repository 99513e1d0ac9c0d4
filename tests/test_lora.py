"""LoRA adapters over the frozen 2-bit base.

Contracts: zero-B attach is an exact no-op; training moves only the
adapters (base planes bit-identical) and reduces loss; adapted models
serve through every path (kernel parity, generate, decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.lm import (
    TernaryLMConfig, generate, init_lm, lm_forward, pack_lm,
)
from smmb_tpu.models.lora import attach_lora, init_lora_lm, make_lora_train_step

CFG = TernaryLMConfig(
    vocab=64, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=32,
    n_kv_heads=1,
)


def _setup(seed=0):
    packed = pack_lm(init_lm(jax.random.PRNGKey(seed), CFG))
    toks = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (4, 16), 0, CFG.vocab
    )
    return packed, toks


def test_zero_adapter_is_noop():
    packed, toks = _setup(1)
    adapters = init_lora_lm(
        jax.random.PRNGKey(2), CFG, rank=4,
        targets=("wq", "wv", "wo", "w_up", "w_down"),
    )
    base = lm_forward(packed, toks, CFG, use_kernel=False)
    adapted = lm_forward(
        attach_lora(packed, adapters), toks, CFG, use_kernel=False
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_lora_trains_and_base_is_frozen():
    packed, toks = _setup(3)
    adapters = init_lora_lm(
        jax.random.PRNGKey(4), CFG, rank=4, targets=("wq", "wv", "w_up")
    )
    base_planes = [np.asarray(b["attn"]["wq"].data) for b in packed["blocks"]]

    init_opt, step = make_lora_train_step(packed, CFG, learning_rate=5e-3)
    opt = init_opt(adapters)
    jstep = jax.jit(step)
    losses = []
    for _ in range(8):
        adapters, opt, loss = jstep(adapters, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    # the 2-bit base never moved
    for b, before in zip(packed["blocks"], base_planes):
        np.testing.assert_array_equal(np.asarray(b["attn"]["wq"].data), before)

    # the trained adapter changes the forward; B actually moved off zero
    y0 = lm_forward(packed, toks, CFG, use_kernel=False)
    y1 = lm_forward(
        attach_lora(packed, adapters), toks, CFG, use_kernel=False
    )
    assert float(jnp.max(jnp.abs(y1 - y0))) > 1e-3


def test_lora_serves_through_kernel_and_generate():
    packed, toks = _setup(5)
    adapters = init_lora_lm(
        jax.random.PRNGKey(6), CFG, rank=4, targets=("wq", "wv", "w_down")
    )
    # make the adapters nonzero without training
    adapters = jax.tree.map(lambda a: a + 0.01, adapters)
    model = attach_lora(packed, adapters)

    yk = lm_forward(model, toks, CFG, use_kernel=True)
    yj = lm_forward(model, toks, CFG, use_kernel=False)
    rel = float(jnp.max(jnp.abs(yk - yj)) / jnp.max(jnp.abs(yj)))
    assert rel < 2e-5, rel

    # full generate (prefill + KV decode) runs with adapters attached and
    # differs from the base model's generation
    g_base = generate(packed, toks[:1, :8], CFG, steps=6, use_kernel=False)
    g_lora = generate(model, toks[:1, :8], CFG, steps=6, use_kernel=False)
    assert g_lora.shape == g_base.shape
    # decode-vs-forward consistency: greedy tokens follow the adapted
    # forward's argmax at step 0
    full = lm_forward(model, toks[:1, :8], CFG, use_kernel=False)
    assert int(g_lora[0, 0]) == int(jnp.argmax(full[0, -1]))


def test_lora_rejects_bad_targets_and_mismatch():
    packed, _ = _setup(7)
    with pytest.raises(ValueError, match="unknown LoRA target"):
        init_lora_lm(jax.random.PRNGKey(8), CFG, targets=("nope",))
    ad = init_lora_lm(jax.random.PRNGKey(9), CFG)
    with pytest.raises(ValueError, match="adapter blocks"):
        attach_lora(packed, ad[:1])


def test_lora_rejected_on_sp_path():
    """The SP partitioner refuses adapted models instead of silently
    serving the frozen base (TP *carries* adapters — tests below; TP-EP
    rejection is covered in test_moe_lm)."""
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.sp_block import block_forward_sp

    packed, _ = _setup(9)
    adapters = init_lora_lm(jax.random.PRNGKey(10), CFG, rank=2)
    model = attach_lora(packed, adapters)
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    x = jnp.zeros((1, 4, CFG.d_model))
    with pytest.raises(ValueError, match="sequence-parallel"):
        block_forward_sp(
            model["blocks"][0], x, CFG.block, mesh=mesh, use_kernel=False
        )


# TP needs ≥128 packed columns per shard and row-sharded K a multiple of
# GROUP_ROWS(512)·shards — sized like test_tp.py's working configs
TP_CFG = TernaryLMConfig(
    vocab=256, d_model=1024, n_heads=4, d_ff=1024, n_layers=2, max_len=32,
)


def test_lora_tp_forward_matches_single():
    """TP serves LoRA-adapted models: adapters are carried through
    shard_block_tp / shard_lm_tp with zero extra collectives, and the
    TP forward matches the single-device adapted forward — on every
    adapted layer kind (column QKV, row wo/w_down, pre-activation w_up)."""
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import lm_forward_tp, shard_lm_tp

    packed = pack_lm(init_lm(jax.random.PRNGKey(30), TP_CFG))
    adapters = init_lora_lm(
        jax.random.PRNGKey(31), TP_CFG, rank=4,
        targets=("wq", "wk", "wv", "wo", "w_up", "w_down"),
    )
    # non-zero B so the adapters actually change the output
    adapters = jax.tree.map(
        lambda a: a + 0.05 * jnp.sin(jnp.arange(a.size, dtype=jnp.float32)
                                     ).reshape(a.shape),
        adapters,
    )
    model = attach_lora(packed, adapters)
    toks = jax.random.randint(jax.random.PRNGKey(32), (2, 8), 0, TP_CFG.vocab)
    ref = np.asarray(lm_forward(model, toks, TP_CFG, use_kernel=False))
    base = np.asarray(lm_forward(packed, toks, TP_CFG, use_kernel=False))
    assert np.max(np.abs(ref - base)) > 1e-3  # adapters are live

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_lm_tp(model, mesh)
    y = np.asarray(
        lm_forward_tp(sharded, toks, TP_CFG, mesh=mesh, use_kernel=False)
    )
    tol = 2e-4 * max(1.0, float(np.max(np.abs(ref))))
    assert np.max(np.abs(y - ref)) < tol, np.max(np.abs(y - ref))


def test_lora_tp_generate_matches_single():
    """TP prefill + head-sharded-cache decode pick the adapters up:
    generate_tp on the adapted model reproduces single-device generate."""
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.tp_transformer import generate_tp, shard_lm_tp

    packed = pack_lm(init_lm(jax.random.PRNGKey(33), TP_CFG))
    adapters = init_lora_lm(jax.random.PRNGKey(34), TP_CFG, rank=4,
                            targets=("wq", "wv", "wo", "w_down"))
    adapters = jax.tree.map(
        lambda a: a + 0.05 * jnp.cos(jnp.arange(a.size, dtype=jnp.float32)
                                     ).reshape(a.shape),
        adapters,
    )
    model = attach_lora(packed, adapters)
    toks = jax.random.randint(jax.random.PRNGKey(35), (2, 8), 0, TP_CFG.vocab)
    g_ref = np.asarray(generate(model, toks, TP_CFG, steps=6,
                                use_kernel=False))
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sharded = shard_lm_tp(model, mesh)
    g_tp = np.asarray(generate_tp(sharded, toks, TP_CFG, 6, mesh=mesh,
                                  use_kernel=False))
    assert (g_tp == g_ref).all()
