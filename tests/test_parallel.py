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


def _bcsr_setup(seed, m, dim, empty_last_quarter=False):
    # block-sparse ternary weights with deliberately NON-uniform block
    # density so per-shard stored-block counts differ (exercises the
    # ragged-to-static padding in parallel/bcsr_sharded.py)
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare

    r = c = 128
    k1, k2, kx, kb = jax.random.split(jax.random.PRNGKey(seed), 4)
    bgrid = (dim // r, dim // c)
    # column-dependent block probability: left columns dense, right sparse
    pcol = np.linspace(0.9, 0.1, bgrid[1])[None, :]
    mask = np.asarray(jax.random.uniform(k1, bgrid)) < pcol
    if empty_last_quarter:
        mask[:, 3 * bgrid[1] // 4:] = False
    tern = np.asarray(rng.rand_ternary(k2, (dim, dim), non_zero=2))
    wd = (tern * np.repeat(np.repeat(mask, r, 0), c, 1)).astype(np.float32)
    x = rng.rand_dense(kx, (m, dim))
    b = rng.rand_dense(kb, (dim,))
    prep = bcsr_prepare(bcsr_from_dense(wd, r, c))
    return x, wd, b, prep


@pytest.mark.parametrize("data,model", [(1, 4), (2, 4)])
def test_bcsr_sharded_column_parity(data, model):
    from smmb_tpu.parallel import shard_bcsr_columns, sharded_bcsr_spmm

    mesh = make_mesh(data, model)
    x, wd, b, prep = _bcsr_setup(31, 16, 1024)
    shards = shard_bcsr_columns(prep, mesh)
    # ragged for real: per-shard stored-block counts must differ for this
    # test to bite (the padding path is the thing under test)
    bc_local = 1024 // model // 128
    shard_of = np.asarray(prep.blk_col)[:-1] // bc_local
    counts = np.bincount(shard_of, minlength=model)
    assert counts.max() > counts.min()
    ref = gemm_prelu(x, jnp.asarray(wd), b, ALPHA)
    y = sharded_bcsr_spmm(x, shards, b, mesh=mesh, alpha=ALPHA)
    assert_close(y, ref, TOL_DENSE, f"bcsr column {data}x{model}")


def test_bcsr_sharded_empty_shard():
    # a whole model shard owns zero blocks: its dummies re-activate the
    # pre-activated bias seed (idempotent epilogue path)
    from smmb_tpu.parallel import shard_bcsr_columns, sharded_bcsr_spmm

    mesh = make_mesh(1, 4)
    x, wd, b, prep = _bcsr_setup(32, 8, 1024, empty_last_quarter=True)
    shards = shard_bcsr_columns(prep, mesh)
    ref = gemm_prelu(x, jnp.asarray(wd), b, ALPHA)
    y = sharded_bcsr_spmm(x, shards, b, mesh=mesh, alpha=ALPHA)
    assert_close(y, ref, TOL_DENSE, "bcsr empty shard")
    # no-alpha path too
    ref2 = gemm(x, jnp.asarray(wd), b)
    y2 = sharded_bcsr_spmm(x, shards, b, mesh=mesh)
    assert_close(y2, ref2, TOL_DENSE, "bcsr empty shard no alpha")


def test_bcsr_sharded_validation():
    from smmb_tpu.parallel import shard_bcsr_columns, sharded_bcsr_spmm

    mesh = make_mesh(1, 8)
    # 1152 = 9 x 128 block-cols: not divisible into 8 column shards
    x, wd, b, prep = _bcsr_setup(33, 8, 1152)
    with pytest.raises(ValueError):
        shard_bcsr_columns(prep, mesh)
    del sharded_bcsr_spmm  # imported for symmetry; validation is host-side


def test_overlapped_column_hlo_keeps_ppermute():
    """Structural guard (VERDICT r4 #7): the ring collective-matmul's
    lowered HLO must still contain one collective-permute per ring step
    (nshard-1 of them) — if XLA ever rewrites the ring into a blocking
    all-gather (de-overlapping the ICI transfer from the per-step
    compute), this count drops and the regression is caught without ICI
    hardware."""
    from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped

    mesh = make_mesh(1, 4)
    x, w, b = _setup(26, 8, 2048, 512)
    p = shard_packed_columns(pack_ternary(w), mesh)
    lowered = sharded_spmm_column_overlapped.lower(
        x, p, b, mesh=mesh, alpha=ALPHA
    )
    hlo = lowered.compile().as_text()
    n_perm = hlo.count("collective-permute(") + hlo.count(
        "collective-permute-start("
    )
    assert n_perm >= mesh.shape["model"] - 1, (
        f"expected >= {mesh.shape['model'] - 1} collective-permutes in the "
        f"optimized HLO, found {n_perm} — the ring overlap was rewritten"
    )
    # and the ring was not replaced by a blocking all-gather of x
    assert hlo.count("all-gather") == 0, "ring rewritten into all-gather"
