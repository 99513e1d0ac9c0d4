"""Data-parallel LM training parity on the virtual 8-device CPU mesh.

Contract: a DP step over the sharded batch computes the SAME update as the
single-device step over the whole batch — XLA's inserted gradient
all-reduce is mathematically the batch-mean, not an approximation.
"""

import jax
import numpy as np

from smmb_tpu.models.lm import TernaryLMConfig, init_lm, make_lm_train_step
from smmb_tpu.parallel import make_lm_train_step_dp, make_mesh
from smmb_tpu.parallel.mesh import DATA_AXIS

CFG = TernaryLMConfig(
    vocab=64, d_model=64, n_heads=2, d_ff=128, n_layers=1, max_len=16
)


def _init():
    params = init_lm(jax.random.PRNGKey(40), CFG)
    params = jax.tree.map(lambda a: a + 0.01, params)
    toks = jax.random.randint(jax.random.PRNGKey(41), (8, 8), 0, CFG.vocab)
    return params, toks


def test_dp_train_matches_single_device():
    """Loss trajectory parity across steps.

    Step-N loss depends on every earlier update, so 3 matching losses prove
    the DP updates track the single-device ones. (Exact param equality is
    NOT the contract: Adam normalizes by sqrt(v), so near-zero gradient
    elements can flip update sign under a different all-reduce summation
    order — see test_dp_gradient_is_full_batch_mean for the sharp check.)
    """
    params, toks = _init()
    init_opt, step = make_lm_train_step(CFG, learning_rate=1e-2)
    opt0 = init_opt(params)

    ref_p, ref_o, jstep = params, opt0, jax.jit(step)
    ref_losses = []
    for _ in range(3):
        ref_p, ref_o, loss = jstep(ref_p, ref_o, toks)
        ref_losses.append(float(loss))

    mesh = make_mesh(8, 1)
    init_opt_dp, step_dp, place = make_lm_train_step_dp(
        CFG, mesh, learning_rate=1e-2
    )
    dp_p, dp_o, dp_t = place(params, init_opt_dp(params), toks)
    assert len(dp_t.sharding.device_set) == 8  # batch really is split
    dp_losses = []
    for _ in range(3):
        dp_p, dp_o, loss = step_dp(dp_p, dp_o, dp_t)
        dp_losses.append(float(loss))

    np.testing.assert_allclose(dp_losses, ref_losses, rtol=1e-5)


def test_dp_gradient_is_full_batch_mean():
    """The all-reduced sharded gradient == the full-batch gradient."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smmb_tpu.models.lm import qat_lm_forward

    params, toks = _init()

    def loss_fn(p, t):
        logits = qat_lm_forward(p, t, CFG)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], t[:, 1:]
        ).mean()

    g_ref = jax.jit(jax.grad(loss_fn))(params, toks)

    mesh = make_mesh(8, 1)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(DATA_AXIS, None))
    g_dp = jax.jit(
        jax.grad(loss_fn), in_shardings=(repl, batch), out_shardings=repl
    )(jax.device_put(params, repl), jax.device_put(toks, batch))

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_dp_train_on_data_model_mesh():
    """DP composes with a nontrivial model axis (batch replicated over it)."""
    params, toks = _init()
    mesh = make_mesh(4, 2)
    init_opt, step_dp, place = make_lm_train_step_dp(
        CFG, mesh, learning_rate=1e-2
    )
    p, o, t = place(params, init_opt(params), toks)
    losses = []
    for _ in range(4):
        p, o, loss = step_dp(p, o, t)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_dp_train_rejects_ragged_batch():
    params, toks = _init()
    mesh = make_mesh(8, 1)
    init_opt, step_dp, place = make_lm_train_step_dp(CFG, mesh)
    try:
        place(params, init_opt(params), toks[:6])
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("ragged batch accepted")


def test_dp_step_contains_cross_device_reduce():
    """The compiled DP step really all-reduces gradients over the mesh."""
    params, toks = _init()
    mesh = make_mesh(8, 1)
    init_opt, step_dp, place = make_lm_train_step_dp(CFG, mesh)
    p, o, t = place(params, init_opt(params), toks)
    txt = step_dp.lower(p, o, t).compile().as_text()
    assert "all-reduce" in txt, "no gradient all-reduce in compiled HLO"
    assert mesh.shape[DATA_AXIS] == 8
