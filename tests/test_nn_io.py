"""Flax module layer + serialization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu import io as smio
from smmb_tpu.formats.bcsr import bcsr_from_dense, bcsr_to_dense
from smmb_tpu.formats.packed import pack_ternary, unpack_ternary
from smmb_tpu.formats.tcsc import tcsc_from_dense, tcsc_to_dense
from smmb_tpu.models.mlp import TernaryMLPConfig, init_mlp, pack_mlp
from smmb_tpu.nn import PackedTernaryDense, TernaryDense, convert_to_packed
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import assert_close


def _tern(seed, shape, nz=2):
    return np.asarray(rng.rand_ternary(jax.random.PRNGKey(seed), shape, nz))


# ---------------------------------------------------------------- io


def test_save_load_roundtrip(tmp_path):
    w = _tern(0, (200, 96))
    for obj, to_dense in (
        (tcsc_from_dense(w), tcsc_to_dense),
        (bcsr_from_dense(w[:192], 8, 8), bcsr_to_dense),
        (pack_ternary(w), unpack_ternary),
    ):
        path = str(tmp_path / f"{type(obj).__name__}.npz")
        smio.save(path, obj)
        back = smio.load(path)
        assert type(back) is type(obj)
        np.testing.assert_array_equal(
            np.asarray(to_dense(back)), np.asarray(to_dense(obj))
        )


def test_save_load_packed_mlp(tmp_path, key):
    cfg = TernaryMLPConfig(layer_dims=(64, 128, 64))
    packed = pack_mlp(init_mlp(key, cfg))
    path = str(tmp_path / "mlp.npz")
    smio.save_packed_mlp(path, packed)
    back = smio.load_packed_mlp(path)
    assert len(back["w"]) == 2
    for a, b in zip(packed["w"], back["w"]):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
        assert (a.rows, a.cols) == (b.rows, b.cols)


# ---------------------------------------------------------------- nn


def test_ternary_dense_trains(key):
    m = TernaryDense(features=32, alpha=0.2)
    x = rng.rand_dense(jax.random.PRNGKey(1), (8, 16))
    params = m.init(key, x)
    y, grads = jax.value_and_grad(
        lambda p: jnp.sum(m.apply(p, x) ** 2)
    )(params)
    assert np.isfinite(float(y))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_convert_and_serve_matches_qat(key):
    # QAT forward == packed serving forward (same effective weights)
    m = TernaryDense(features=128, alpha=0.2)
    x = rng.rand_dense(jax.random.PRNGKey(2), (4, 64))
    params = m.init(key, x)
    y_qat = m.apply(params, x)

    packed_params = convert_to_packed(params["params"])
    serve = PackedTernaryDense(
        features=128, in_features=64, alpha=0.2,
        compute_dtype=jnp.float32, use_kernel=False,
    )
    y_srv = serve.apply({"params": packed_params}, x)
    assert_close(y_srv, y_qat, 1e-4, "packed serving vs QAT")


def test_convert_nested_tree(key):
    m = TernaryDense(features=16, alpha=None)
    x = rng.rand_dense(jax.random.PRNGKey(3), (2, 8))
    params = m.init(key, x)
    tree = {"layers_0": params["params"], "other": {"stats": jnp.ones(3)}}
    out = convert_to_packed(tree)
    assert "packed_kernel" in out["layers_0"]
    assert "kernel_scale" in out["layers_0"]
    np.testing.assert_array_equal(np.asarray(out["other"]["stats"]), 1.0)


def test_save_load_params(tmp_path, key):
    cfg = TernaryMLPConfig(layer_dims=(32, 64, 32))
    params = init_mlp(key, cfg)
    path = str(tmp_path / "params.npz")
    smio.save_params(path, params)
    back = smio.load_params(path)
    for a, b in zip(params["w"], back["w"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(params["b"], back["b"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_training_checkpoint_roundtrip(tmp_path, key):
    # backs the io.py claim that training checkpoints of fp32 masters are
    # plain pytrees handled by orbax — full save/restore round-trip
    import orbax.checkpoint as ocp

    cfg = TernaryMLPConfig(layer_dims=(32, 64, 32))
    params = init_mlp(key, cfg)
    ckptr = ocp.StandardCheckpointer()
    path = tmp_path / "ckpt"
    ckptr.save(path, params)
    ckptr.wait_until_finished()
    restored = ckptr.restore(path, params)
    for a, b in zip(params["w"], restored["w"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(params["b"], restored["b"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_float_meta_preserved(tmp_path):
    # io.load must not truncate non-integral meta (ADVICE round 1)
    import dataclasses

    from smmb_tpu import io as smio_mod

    @dataclasses.dataclass(frozen=True)
    class FakeFmt:
        data: object
        rows: int
        scale: float

    smio_mod._KIND["FakeFmt"] = FakeFmt
    try:
        path = str(tmp_path / "f.npz")
        smio_mod.save(path, FakeFmt(data=np.ones(3), rows=4, scale=0.75))
        back = smio_mod.load(path)
        assert back.rows == 4 and isinstance(back.rows, int)
        assert back.scale == 0.75
    finally:
        del smio_mod._KIND["FakeFmt"]


def test_pytree_artifact_roundtrip_lm(tmp_path):
    # whole-model serving artifact: save a packed LM, load into a template
    # built from a *different* seed, and get identical serving logits
    from smmb_tpu.models.lm import TernaryLMConfig, init_lm, lm_forward, pack_lm

    cfg = TernaryLMConfig(
        vocab=128, d_model=128, n_heads=2, d_ff=256, n_layers=2, max_len=16
    )
    packed = pack_lm(init_lm(jax.random.PRNGKey(0), cfg))
    path = str(tmp_path / "lm.npz")
    smio.save_pytree(path, packed)
    template = pack_lm(init_lm(jax.random.PRNGKey(99), cfg))
    back = smio.load_pytree(path, template)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, cfg.vocab)
    a = lm_forward(packed, toks, cfg, use_kernel=False)
    b = lm_forward(back, toks, cfg, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_artifact_rejects_wrong_template(tmp_path):
    import pytest

    from smmb_tpu.models.moe import TernaryMoEConfig, init_moe, pack_moe

    cfg = TernaryMoEConfig(d_model=64, d_ff=128, n_experts=2)
    packed = pack_moe(init_moe(jax.random.PRNGKey(3), cfg))
    path = str(tmp_path / "moe.npz")
    smio.save_pytree(path, packed)
    # same structure, wrong shapes -> shape error, not silent corruption
    bad_cfg = TernaryMoEConfig(d_model=128, d_ff=128, n_experts=2)
    bad = pack_moe(init_moe(jax.random.PRNGKey(3), bad_cfg))
    with pytest.raises(ValueError):
        smio.load_pytree(path, bad)
    back = smio.load_pytree(path, pack_moe(init_moe(jax.random.PRNGKey(9), cfg)))
    from smmb_tpu.models.moe import moe_forward

    x = rng.rand_dense(jax.random.PRNGKey(5), (8, cfg.d_model))
    np.testing.assert_array_equal(
        np.asarray(moe_forward(packed, x, cfg, use_kernel=False)),
        np.asarray(moe_forward(back, x, cfg, use_kernel=False)),
    )
