"""Ternary MoE: routing algebra, packed-expert parity, expert parallelism.

Oracle: dense-master math applied per token with the same top-1 routing —
for kept tokens ``y = gate · ffn_e(x)``, dropped tokens contribute zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.models.moe import (
    TernaryMoEConfig,
    init_moe,
    moe_forward,
    pack_moe,
    route_top1,
)
from smmb_tpu.parallel import make_mesh
from smmb_tpu.parallel.ep_moe import moe_forward_ep, shard_moe_ep
from smmb_tpu.utils import rng

CFG = TernaryMoEConfig(d_model=128, d_ff=256, n_experts=4)


def _setup(seed=0, n=32):
    params = init_moe(jax.random.PRNGKey(seed), CFG)
    packed = pack_moe(params)
    x = rng.rand_dense(jax.random.PRNGKey(seed + 1), (n, CFG.d_model)) * 0.5
    return params, packed, x


def _dense_oracle(params, x, cfg, capacity):
    """Per-token dense-master reference with identical routing."""
    logits = np.asarray(x @ params["router"])
    gates = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    expert = gates.argmax(-1)
    counts = {e: 0 for e in range(cfg.n_experts)}
    y = np.zeros_like(np.asarray(x))
    w_up = np.asarray(params["w_up"])
    w_down = np.asarray(params["w_down"])
    b_up = np.asarray(params["b_up"])
    b_down = np.asarray(params["b_down"])
    xn = np.asarray(x)
    for i in range(x.shape[0]):
        e = int(expert[i])
        if counts[e] >= capacity:
            continue  # dropped
        counts[e] += 1
        h = xn[i] @ w_up[e] + b_up[e]
        h = np.where(h > 0, h, cfg.alpha * h)
        y[i] = gates[i, e] * (h @ w_down[e] + b_down[e])
    return y


def test_route_top1_positions():
    logits = jnp.asarray(
        [[9.0, 0.0], [9.0, 0.0], [0.0, 9.0], [9.0, 0.0]]
    )
    dispatch, combine = route_top1(logits, capacity=2)
    d = np.asarray(dispatch)
    # tokens 0,1 fill expert-0 slots 0,1; token 2 → expert-1 slot 0;
    # token 3 overflows expert 0's capacity and is dropped
    assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1 and d[2, 1, 0] == 1
    assert d[3].sum() == 0
    assert np.all(np.asarray(combine).sum(axis=(1, 2))[:3] > 0.5)


def test_moe_matches_dense_oracle():
    params, packed, x = _setup(3)
    cap = CFG.capacity(x.shape[0])
    ref = _dense_oracle(params, x, CFG, cap)
    y = moe_forward(packed, x, CFG, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4, rtol=0)


def test_moe_kernel_matches_jnp():
    _, packed, x = _setup(5)
    yk = moe_forward(packed, x, CFG, use_kernel=True)
    yj = moe_forward(packed, x, CFG, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(yk), np.asarray(yj), atol=2e-4, rtol=0
    )


def test_moe_quantized_pack():
    params, _, x = _setup(7)
    params = jax.tree.map(lambda a: a + 0.01, params)
    packed = pack_moe(params, quantize=True)
    y = moe_forward(packed, x, CFG, use_kernel=False)
    assert np.all(np.isfinite(np.asarray(y)))
    assert float(np.abs(np.asarray(y)).max()) > 0


@pytest.mark.parametrize("data,model", [(1, 2), (1, 4), (2, 2)])
def test_moe_ep_matches_single(data, model):
    # generous capacity → no drops → expert-parallel equals single-device
    # regardless of slot ordering (per-shard routing reorders slots only)
    cfg = TernaryMoEConfig(
        d_model=128, d_ff=256, n_experts=4, capacity_factor=4.0
    )
    mesh = make_mesh(data, model, devices=jax.devices()[: data * model])
    params = init_moe(jax.random.PRNGKey(11), cfg)
    packed = pack_moe(params)
    x = rng.rand_dense(jax.random.PRNGKey(12), (32, cfg.d_model)) * 0.5
    ref = moe_forward(packed, x, cfg, use_kernel=False)
    sharded = shard_moe_ep(packed, mesh)
    y = moe_forward_ep(sharded, x, cfg, mesh=mesh, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), atol=2e-4, rtol=0
    )


def test_moe_train_step_reduces_loss():
    from smmb_tpu.models.moe import make_moe_train_step, qat_moe_forward

    cfg = TernaryMoEConfig(d_model=64, d_ff=128, n_experts=4)
    params = init_moe(jax.random.PRNGKey(17), cfg)
    params = jax.tree.map(lambda a: a + 0.01, params)
    x = rng.rand_dense(jax.random.PRNGKey(18), (32, cfg.d_model)) * 0.5
    y = rng.rand_dense(jax.random.PRNGKey(19), (32, cfg.d_model)) * 0.5
    init_opt, step = make_moe_train_step(cfg, learning_rate=1e-2)
    opt = init_opt(params)
    jstep = jax.jit(step)
    losses = []
    for _ in range(8):
        params, opt, loss = jstep(params, opt, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # the trained masters pack to the serving form and produce finite output
    out = moe_forward(pack_moe(params, quantize=True), x, cfg, use_kernel=False)
    assert np.all(np.isfinite(np.asarray(out)))
    # aux loss is differentiable and non-negative
    _, aux = qat_moe_forward(params, x, cfg)
    assert float(aux) >= 0


def test_moe_ep_rejects_uneven_experts():
    mesh = make_mesh(1, 8)
    params = init_moe(jax.random.PRNGKey(13), CFG)  # 4 experts, 8 shards
    with pytest.raises(ValueError):
        shard_moe_ep(pack_moe(params), mesh)


def _dense_oracle_topk(params, x, cfg, capacity):
    """Per-token dense-master reference for GShard top-k routing:
    renormalized top-k gates, rank-major slot priority."""
    logits = np.asarray(x @ params["router"])
    gates = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    order = np.argsort(-gates, axis=-1)[:, : cfg.top_k]  # (N, k) by rank
    y = np.zeros_like(np.asarray(x))
    counts = {e: 0 for e in range(cfg.n_experts)}
    xn = np.asarray(x)
    w_up, w_down = np.asarray(params["w_up"]), np.asarray(params["w_down"])
    b_up, b_down = np.asarray(params["b_up"]), np.asarray(params["b_down"])
    norm = gates[np.arange(len(xn))[:, None], order].sum(-1)
    for r in range(cfg.top_k):  # rank-major claiming, like route_topk
        for i in range(xn.shape[0]):
            e = int(order[i, r])
            if counts[e] >= capacity:
                continue
            counts[e] += 1
            h = xn[i] @ w_up[e] + b_up[e]
            h = np.where(h > 0, h, cfg.alpha * h)
            y[i] += gates[i, e] / norm[i] * (h @ w_down[e] + b_down[e])
    return y


def test_route_topk_rank_priority():
    """Rank-0 choices claim capacity before any rank-1 choice."""
    from smmb_tpu.models.moe import route_topk

    # both tokens: rank0 = expert0, rank1 = expert1; capacity 1
    logits = jnp.asarray([[9.0, 5.0, 0.0], [9.0, 5.0, 0.0]])
    dispatch, combine = route_topk(logits, capacity=1, k=2)
    d = np.asarray(dispatch)
    assert d[0, 0, 0] == 1  # token0 rank0 got expert0's only slot
    assert d[1, 0].sum() == 0  # token1 rank0 dropped (expert0 full)
    assert d[0, 1, 0] == 1  # token0 rank1 got expert1's only slot
    assert d[1, 1].sum() == 0  # token1 rank1 dropped too
    c = np.asarray(combine)
    # token0's two gates renormalize to sum 1
    np.testing.assert_allclose(c[0].sum(), 1.0, atol=1e-6)


def test_moe_top2_matches_dense_oracle():
    cfg = TernaryMoEConfig(d_model=128, d_ff=256, n_experts=4, top_k=2)
    params = init_moe(jax.random.PRNGKey(40), cfg)
    packed = pack_moe(params)
    x = rng.rand_dense(jax.random.PRNGKey(41), (32, 128)) * 0.5
    cap = cfg.capacity(32)
    ref = _dense_oracle_topk(params, x, cfg, cap)
    y = moe_forward(packed, x, cfg, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4, rtol=0)


def test_moe_top2_ep_matches_single():
    cfg = TernaryMoEConfig(d_model=128, d_ff=256, n_experts=8, top_k=2)
    params = init_moe(jax.random.PRNGKey(42), cfg)
    packed = pack_moe(params)
    x = rng.rand_dense(jax.random.PRNGKey(43), (32, 128)) * 0.5
    ref = moe_forward(packed, x, cfg, use_kernel=False)
    mesh = make_mesh(2, 4)
    sharded = shard_moe_ep(packed, mesh)
    y = moe_forward_ep(sharded, x, cfg, mesh=mesh, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), atol=2e-4, rtol=0
    )


def test_moe_top2_qat_trains():
    from smmb_tpu.models.moe import make_moe_train_step

    cfg = TernaryMoEConfig(d_model=64, d_ff=128, n_experts=4, top_k=2)
    params = init_moe(jax.random.PRNGKey(44), cfg)
    params = jax.tree.map(lambda a: a + 0.01, params)
    x = rng.rand_dense(jax.random.PRNGKey(45), (16, 64)) * 0.5
    y = rng.rand_dense(jax.random.PRNGKey(46), (16, 64)) * 0.5
    init_opt, step = make_moe_train_step(cfg, learning_rate=1e-2)
    opt = init_opt(params)
    jstep = jax.jit(step)
    losses = []
    for _ in range(6):
        params, opt, loss = jstep(params, opt, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
