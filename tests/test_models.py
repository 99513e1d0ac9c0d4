"""Model-layer tests: packed forward parity and STE training."""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    pack_mlp,
)
from smmb_tpu.models.train import (
    absmean_scale,
    make_train_step,
    qat_forward,
    ternarize_ste,
)
from smmb_tpu.ops import gemm_prelu
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close


def test_mlp_forward_matches_dense_oracle(key):
    cfg = TernaryMLPConfig(layer_dims=(256, 512, 256))
    params = init_mlp(key, cfg)
    packed = pack_mlp(params)
    x = rng.rand_dense(jax.random.PRNGKey(3), (8, 256))
    y = mlp_forward(packed, x, cfg)
    ref = x
    for w, b in zip(params["w"], params["b"]):
        ref = gemm_prelu(ref, w, b, cfg.alpha)
    # multi-layer outputs reach magnitude ~1e2; scale the abs tolerance
    # (bias applies in the kernel epilogue — different rounding order)
    tol = max(TOL_DENSE, 2e-6 * float(np.abs(np.asarray(ref)).max()))
    assert_close(y, ref, tol, "mlp vs per-layer oracle")


def test_ternarize_ste_values():
    w = jnp.array([[0.9, -0.05, -2.0], [0.2, 0.0, 0.4]])
    t = ternarize_ste(w)
    assert set(np.unique(np.asarray(t))) <= {-1.0, 0.0, 1.0}
    # gradient passes straight through
    g = jax.grad(lambda w: (ternarize_ste(w) * w).sum())(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_qat_forward_finite(key):
    cfg = TernaryMLPConfig(layer_dims=(64, 128, 64))
    params = init_mlp(key, cfg)
    # master weights here are already ternary; perturb to fp32-ish values
    params = {
        "w": [w + 0.01 for w in params["w"]],
        "b": params["b"],
    }
    x = rng.rand_dense(jax.random.PRNGKey(5), (4, 64))
    y = qat_forward(params, x, 0.2)
    assert np.all(np.isfinite(np.asarray(y)))


def test_train_step_reduces_loss(key):
    cfg = TernaryMLPConfig(layer_dims=(32, 64, 32))
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, cfg)
    params = {"w": [w * 0.5 + 0.1 for w in params["w"]], "b": params["b"]}
    x = rng.rand_dense(kx, (64, 32))
    y = rng.rand_dense(ky, (64, 32))
    init_opt, step = make_train_step(alpha=cfg.alpha, learning_rate=1e-2)
    opt_state = init_opt(params)
    jstep = jax.jit(step)
    losses = []
    for _ in range(20):
        params, opt_state, loss = jstep(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_absmean_scale_positive(key):
    w = rng.rand_dense(key, (16, 16))
    assert float(absmean_scale(w)) > 0


def test_qat_serving_parity(key):
    # regression: the served packed model must compute the same function the
    # STE training forward optimizes (absmean scale must not be dropped)
    from smmb_tpu.models.train import qat_forward

    cfg = TernaryMLPConfig(layer_dims=(64, 128, 64))
    kp, kx = jax.random.split(key)
    params = init_mlp(kp, cfg)
    params = {"w": [w * 0.7 + 0.05 for w in params["w"]], "b": params["b"]}
    x = rng.rand_dense(kx, (8, 64))
    trained = qat_forward(params, x, cfg.alpha)
    packed = pack_mlp(params, quantize=True)
    served = mlp_forward(packed, x, cfg, use_kernel=False)
    tol = max(1e-4, 2e-6 * float(np.abs(np.asarray(trained)).max()))
    assert_close(served, trained, tol, "QAT vs packed serving")


def test_attention_qat_serving_parity(key):
    from smmb_tpu.models.attention import (
        TernaryAttentionConfig,
        attention_forward,
        init_attention,
        pack_attention,
        qat_attention_forward,
    )

    cfg = TernaryAttentionConfig(d_model=64, n_heads=2)
    params = init_attention(key, cfg)
    params = {k_: v * 0.6 + 0.02 for k_, v in params.items()}
    x = rng.rand_dense(jax.random.PRNGKey(7), (2, 8, 64))
    trained = qat_attention_forward(params, x, cfg)
    served = attention_forward(
        pack_attention(params, quantize=True), x, cfg, use_kernel=False
    )
    tol = max(1e-3, 1e-5 * float(np.abs(np.asarray(trained)).max()))
    assert_close(served, trained, tol, "attention QAT vs serving")
