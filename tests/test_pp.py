"""Pipeline-parallel LM parity on the virtual CPU mesh.

Contract: the GPipe-style staged forward (parallel/pp_lm.py) equals the
single-device forward within dense-accumulation tolerance, composing with
data parallelism, for both the jnp path and the Pallas kernel path.
"""

import jax
import numpy as np
import pytest

from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm
from smmb_tpu.parallel import make_mesh
from smmb_tpu.parallel.pp_lm import lm_forward_pp, shard_lm_pp
from smmb_tpu.utils.compare import TOL_DENSE, assert_close

CFG = TernaryLMConfig(
    vocab=512, d_model=256, n_heads=4, d_ff=512, n_layers=2, max_len=32
)


def _setup(seed=0, batch=4, t=6):
    params = init_lm(jax.random.PRNGKey(seed), CFG)
    packed = pack_lm(params)
    toks = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (batch, t), 0, CFG.vocab
    )
    return packed, toks


def _assert_scaled(y, ref, what):
    tol = max(TOL_DENSE, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    assert_close(y, ref, tol, what)


@pytest.mark.parametrize("data,model,u", [(1, 2, 2), (2, 2, 2), (1, 2, 4)])
def test_pp_matches_single(data, model, u):
    mesh = make_mesh(data, model, devices=jax.devices()[: data * model])
    packed, toks = _setup(61)
    ref = np.asarray(lm_forward(packed, toks, CFG, use_kernel=False))
    sharded = shard_lm_pp(packed, mesh)
    y = lm_forward_pp(
        sharded, toks, CFG, mesh=mesh, microbatches=u, use_kernel=False
    )
    _assert_scaled(y, ref, f"pp {data}x{model} u={u}")


def test_pp_kernel_path():
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    packed, toks = _setup(71, batch=2, t=2)
    ref = np.asarray(lm_forward(packed, toks, CFG, use_kernel=False))
    sharded = shard_lm_pp(packed, mesh)
    y = lm_forward_pp(
        sharded, toks, CFG, mesh=mesh, microbatches=2, use_kernel=True
    )
    _assert_scaled(y, ref, "pp kernel")


def test_pp_rejects_uneven_layers():
    mesh = make_mesh(1, 4)
    packed, _ = _setup(81)  # n_layers=2 not divisible by 4 stages
    with pytest.raises(ValueError):
        shard_lm_pp(packed, mesh)


def test_pp_moe_lm_matches_single():
    """MoE blocks through the GPipe schedule: the pipeline is
    architecture-agnostic (cfg._blk dispatch; MoE pytrees stack)."""
    from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm
    from smmb_tpu.parallel import make_mesh
    from smmb_tpu.parallel.pp_lm import lm_forward_pp, shard_lm_pp

    cfg = TernaryLMConfig(
        vocab=64, d_model=128, n_heads=2, d_ff=128, n_layers=2, max_len=16,
        n_experts=4, top_k=2,
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(70), cfg))
    toks = jax.random.randint(jax.random.PRNGKey(71), (4, 8), 0, cfg.vocab)
    ref = np.asarray(
        lm_forward(
            packed, toks, cfg, use_kernel=False,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    sharded = shard_lm_pp(packed, mesh)
    y = lm_forward_pp(
        sharded, toks, cfg, mesh=mesh, microbatches=2, use_kernel=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    tol = max(1e-4, 5e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=tol, rtol=0)
