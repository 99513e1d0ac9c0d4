"""Multi-device parity tests on the virtual 8-device CPU mesh.

The contract (SURVEY.md §4 implication, BASELINE.md correctness row):
mesh-sharded results equal single-device results within the reference
tolerance, for both weight partitionings and the full MLP pairing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    mlp_forward_sharded,
    pack_mlp,
    shard_mlp,
)
from smmb_tpu.ops import gemm, gemm_prelu
from smmb_tpu.parallel import (
    make_mesh,
    shard_packed_columns,
    shard_packed_rows,
    sharded_spmm_column,
    sharded_spmm_row,
)
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close

ALPHA = 0.2


def _setup(seed, m, k, n):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = rng.rand_dense(kx, (m, k))
    w = rng.rand_ternary(kw, (k, n), non_zero=2)
    b = rng.rand_dense(kb, (n,))
    return x, np.asarray(w), b


def test_mesh_shapes():
    mesh = make_mesh(2, 4)
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    mesh = make_mesh(2)  # model inferred = 4
    assert mesh.shape["model"] == 4


@pytest.mark.parametrize("data,model", [(1, 8), (2, 4), (8, 1)])
def test_sharded_column_parity(data, model):
    mesh = make_mesh(data, model)
    x, w, b = _setup(21, 16, 512, 1024)
    ref = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    p = shard_packed_columns(pack_ternary(w), mesh)
    y = sharded_spmm_column(x, p, b, mesh=mesh, alpha=ALPHA)
    assert_close(y, ref, TOL_DENSE, f"column {data}x{model}")


@pytest.mark.parametrize("data,model", [(1, 8), (2, 4)])
def test_sharded_row_parity(data, model):
    mesh = make_mesh(data, model)
    # K = 4096 → 8 packed groups, divisible across model shards
    x, w, b = _setup(22, 8, 4096, 256)
    ref = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    p = shard_packed_rows(pack_ternary(w), mesh)
    y = sharded_spmm_row(x, p, b, mesh=mesh, alpha=ALPHA)
    assert_close(y, ref, TOL_DENSE, f"row {data}x{model}")


def test_sharded_no_bias():
    mesh = make_mesh(1, 8)
    x, w, _ = _setup(23, 4, 512, 1024)
    ref = gemm(x, jnp.asarray(w))
    p = shard_packed_columns(pack_ternary(w), mesh)
    y = sharded_spmm_column(x, p, None, mesh=mesh)
    assert_close(y, ref, TOL_DENSE, "column no-bias")


def test_shard_validation():
    mesh = make_mesh(1, 8)
    w = pack_ternary(np.zeros((512, 100), np.float32))
    with pytest.raises(ValueError):
        shard_packed_columns(w, mesh)  # 100 not a multiple of 8*128


def test_mlp_sharded_matches_single(key):
    # BASELINE.json config 5: multi-layer sharded ternary MLP forward
    mesh = make_mesh(2, 4)
    # row-parallel layers need K divisible into 512-row packed groups per
    # model shard: K=2048 → 4 groups over model=4
    cfg = TernaryMLPConfig(layer_dims=(512, 2048, 512, 1024))
    params = init_mlp(key, cfg)
    packed = pack_mlp(params)
    x = rng.rand_dense(jax.random.PRNGKey(9), (16, 512))
    ref = mlp_forward(packed, x, cfg)
    sharded = shard_mlp(packed, mesh)
    y = mlp_forward_sharded(sharded, x, cfg, mesh=mesh)
    # psum reduction order differs from the single-device k-tile loop; with
    # layer outputs of magnitude ~2.5e2 the abs tolerance must scale (this
    # is ~1e-5 relative — well inside the reference's contract)
    tol = max(TOL_DENSE, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    assert_close(y, ref, tol, "sharded MLP")


def test_mlp_sharded_odd_depth(key):
    # layer_dims of length 4 ⇒ num_layers=3 (genuinely odd): exercises the
    # final column-parallel layer's gather branch (n_layers % 2 == 1)
    mesh = make_mesh(1, 2)
    cfg = TernaryMLPConfig(layer_dims=(512, 1024, 512, 1024))
    params = init_mlp(key, cfg)
    packed = pack_mlp(params)
    x = rng.rand_dense(jax.random.PRNGKey(10), (8, 512))
    ref = mlp_forward(packed, x, cfg)
    sharded = shard_mlp(packed, mesh)
    y = mlp_forward_sharded(sharded, x, cfg, mesh=mesh)
    tol = max(TOL_DENSE, 2e-5 * float(np.abs(np.asarray(ref)).max()))
    assert_close(y, ref, tol, "odd-depth sharded MLP")


def test_overlapped_column_parity():
    # ring collective-matmul path == plain column-parallel == dense oracle
    from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped

    mesh = make_mesh(1, 4)
    x, w, b = _setup(24, 8, 2048, 512)  # K=2048 = 4 shards x 512-row groups
    ref = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    p = shard_packed_columns(pack_ternary(w), mesh)
    y = sharded_spmm_column_overlapped(x, p, b, mesh=mesh, alpha=ALPHA)
    assert_close(y, ref, TOL_DENSE, "overlapped column")


def test_overlapped_column_validation():
    from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped

    mesh = make_mesh(1, 4)
    x, w, b = _setup(25, 4, 1024, 512)  # 1024 rows = 2 groups, not /4
    p = shard_packed_columns(pack_ternary(w), mesh)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sharded_spmm_column_overlapped(x, p, b, mesh=mesh)
