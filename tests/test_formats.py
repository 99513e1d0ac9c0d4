"""Format construction / round-trip tests.

Covers the reference's structural tests (/root/reference/test/test.c — 4×4
known-pattern BCSR; /root/reference/test/test_bcsr.cpp — random parity) with
real assertions and seeded determinism, plus the all-zero-block-row edge case
the reference's constructor gets wrong (SURVEY.md §2 item 12, §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.bcsr import (
    BCSR,
    bcsr_block_rows,
    bcsr_from_dense,
    bcsr_to_dense,
)
from smmb_tpu.formats.packed import (
    concat_packed_cols,
    TernaryPacked,
    pack_ternary,
    pack_ternary_device,
    unpack_ternary,
)
from smmb_tpu.formats.tcsc import (
    tcsc_from_dense,
    tcsc_pad_columns,
    tcsc_to_dense,
)
from smmb_tpu.utils import rng


def _ternary(key, shape, non_zero=2):
    return np.asarray(rng.rand_ternary(key, shape, non_zero=non_zero))


# ---------------------------------------------------------------- TCSC


def test_tcsc_roundtrip(key):
    w = _ternary(key, (64, 48))
    t = tcsc_from_dense(w)
    np.testing.assert_array_equal(np.asarray(tcsc_to_dense(t)), w)
    assert t.n_pos == int((w == 1.0).sum())
    assert t.n_neg == int((w == -1.0).sum())


def test_tcsc_known_pattern():
    # column-major fill order contract (/root/reference/sparse/tcsc.c:48-63)
    w = np.zeros((4, 3), np.float32)
    w[0, 0] = 1.0
    w[2, 0] = -1.0
    w[1, 1] = 1.0
    w[3, 1] = 1.0
    t = tcsc_from_dense(w)
    np.testing.assert_array_equal(np.asarray(t.col_start_pos), [0, 1, 3, 3])
    np.testing.assert_array_equal(np.asarray(t.row_index_pos), [0, 1, 3])
    np.testing.assert_array_equal(np.asarray(t.col_start_neg), [0, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(t.row_index_neg), [2])


def test_tcsc_ignores_non_unit_values():
    # exact ±1.0 matches only (/root/reference/sparse/tcsc.c:54-57)
    w = np.array([[0.5, -1.0], [1.0, 0.99]], np.float32)
    t = tcsc_from_dense(w)
    assert t.n_pos == 1 and t.n_neg == 1


def test_tcsc_padded_sentinel(key):
    w = _ternary(key, (32, 16))
    t = tcsc_from_dense(w)
    p = tcsc_pad_columns(t)
    idx = np.asarray(p.idx_pos)
    cnt = np.asarray(p.cnt_pos)
    for j in range(16):
        assert (idx[j, cnt[j] :] == 32).all()  # sentinel = rows
        col = np.flatnonzero(w[:, j] == 1.0)
        np.testing.assert_array_equal(idx[j, : cnt[j]], col)


def test_tcsc_empty_matrix():
    w = np.zeros((8, 8), np.float32)
    t = tcsc_from_dense(w)
    assert t.nnz == 0
    np.testing.assert_array_equal(np.asarray(tcsc_to_dense(t)), w)
    p = tcsc_pad_columns(t)
    assert p.pad_pos >= 1  # degenerate pad stays ≥1 for static shapes


# ---------------------------------------------------------------- BCSR


def test_bcsr_known_pattern():
    # 4×4 matrix, 2×2 blocks — the reference's structure test
    # (/root/reference/test/test.c:5-29), with assertions added.
    w = np.zeros((4, 4), np.float32)
    w[0, 0] = 1.0  # block (0, 0)
    w[3, 2] = -1.0  # block (1, 1)
    m = bcsr_from_dense(w, 2, 2)
    assert m.k == 2
    np.testing.assert_array_equal(np.asarray(m.b_row_start), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(m.b_col_idx), [0, 1])
    np.testing.assert_array_equal(np.asarray(bcsr_block_rows(m)), [0, 1])


def test_bcsr_roundtrip(key):
    w = _ternary(key, (32, 64), non_zero=8)
    m = bcsr_from_dense(w, 8, 8)
    np.testing.assert_array_equal(np.asarray(bcsr_to_dense(m)), w)


def test_bcsr_zero_block_row():
    # The reference corrupts b_row_start when a block row is all zeros
    # (/root/reference/sparse/bcsr.c:101-117). Ours must not.
    w = np.zeros((12, 8), np.float32)
    w[0, 0] = 1.0  # block row 0
    # block row 1 (rows 4-7): entirely zero
    w[9, 5] = -1.0  # block row 2
    m = bcsr_from_dense(w, 4, 4)
    assert m.k == 2
    np.testing.assert_array_equal(np.asarray(m.b_row_start), [0, 1, 1, 2])
    np.testing.assert_array_equal(np.asarray(bcsr_block_rows(m)), [0, 2])
    np.testing.assert_array_equal(np.asarray(bcsr_to_dense(m)), w)


def test_bcsr_shape_validation():
    with pytest.raises(ValueError):
        bcsr_from_dense(np.zeros((10, 8), np.float32), 4, 4)


# ---------------------------------------------------------------- packed


def test_packed_roundtrip(key):
    w = _ternary(key, (100, 64))  # deliberately not a multiple of 128
    p = pack_ternary(w)
    assert p.data.dtype == jnp.int8
    assert p.packed_rows % 32 == 0
    np.testing.assert_array_equal(np.asarray(unpack_ternary(p)), w)
    assert p.nnz == int(np.count_nonzero(w))


def test_concat_packed_cols(key):
    """[Wq|Wk|Wv] fusion: packing is column-independent, so the fused
    plane must decode to the dense concat exactly (the serving decode
    path's correctness hinges on this — models/attention._proj_qkv)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ws = [_ternary(k1, (600, 64)), _ternary(k2, (600, 128)),
          _ternary(k3, (600, 32))]
    ps = [pack_ternary(w) for w in ws]
    fused = concat_packed_cols(ps)
    assert fused.rows == 600 and fused.cols == 64 + 128 + 32
    assert fused.nnz == sum(p.nnz for p in ps)
    np.testing.assert_array_equal(
        np.asarray(unpack_ternary(fused)), np.concatenate(ws, axis=1)
    )


def test_concat_packed_cols_rejects_row_mismatch(key):
    k1, k2 = jax.random.split(key)
    with pytest.raises(ValueError, match="row mismatch"):
        concat_packed_cols(
            [pack_ternary(_ternary(k1, (128, 64))),
             pack_ternary(_ternary(k2, (256, 64)))]
        )


def test_packed_device_matches_host(key):
    w = _ternary(key, (256, 128))
    ph = pack_ternary(w)
    pd = pack_ternary_device(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(ph.data), np.asarray(pd.data))


def test_packed_ignores_non_unit_values():
    w = np.array([[0.5, -1.0], [1.0, 2.0]], np.float32)
    p = pack_ternary(w)
    dense = np.asarray(unpack_ternary(p))
    np.testing.assert_array_equal(dense, [[0.0, -1.0], [1.0, 0.0]])


def test_packed_unpack_jit(key):
    w = _ternary(key, (128, 128))
    p = pack_ternary(w)
    out = jax.jit(unpack_ternary)(p)
    np.testing.assert_array_equal(np.asarray(out), w)


# ------------------------------------------------- legacy threshold path


def test_threshold_construction_semantics():
    # legacy compares are thresholds, not exact matches
    # (/root/reference/SparseGEMM.h:26-34): 5 → +1, -3 → -1, 0 stays 0
    from smmb_tpu.formats import (
        pack_ternary_threshold,
        tcsc_from_dense_threshold,
        ternarize_threshold,
    )
    from smmb_tpu.formats.packed import unpack_ternary
    from smmb_tpu.formats.tcsc import tcsc_to_dense

    w = np.array([[5, -3, 0, 1], [-1, 2, -7, 0]], np.int32)
    expect = np.array([[1, -1, 0, 1], [-1, 1, -1, 0]], np.float32)
    np.testing.assert_array_equal(ternarize_threshold(w), expect)
    np.testing.assert_array_equal(
        np.asarray(tcsc_to_dense(tcsc_from_dense_threshold(w))), expect
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_ternary(pack_ternary_threshold(w))), expect
    )


def test_legacy_int_workload_parity(key):
    # the legacy driver's own workload: initX int activations ×
    # generateSparseMatrix weights, sparseGEMM vs dense GEMM within the
    # legacy tolerance 1e-5 (/root/reference/SparseGEMM.h:171-184,
    # SparseGEMM.cpp:95-118)
    import jax.numpy as jnp

    from smmb_tpu.formats import pack_ternary_threshold, ternarize_threshold
    from smmb_tpu.formats.legacy import tcsc_from_dense_threshold
    from smmb_tpu.ops import gemm, packed_spmm_jnp, tcsc_spmm
    from smmb_tpu.utils.compare import TOL_LEGACY, assert_close

    k1, k2, k3 = jax.random.split(key, 3)
    x = rng.rand_int_dense(k1, (8, 256), value_range=4)
    # int weight matrix with out-of-range magnitudes: threshold semantics
    w_int = np.asarray(rng.rand_int_dense(k2, (256, 128), value_range=2))
    b = rng.rand_int_dense(k3, (128,), value_range=4)
    oracle = gemm(x, jnp.asarray(ternarize_threshold(w_int)), b)

    t = tcsc_from_dense_threshold(w_int)
    assert_close(tcsc_spmm(x, t, b), oracle, TOL_LEGACY, "legacy tcsc")
    p = pack_ternary_threshold(w_int)
    assert_close(packed_spmm_jnp(x, p, b), oracle, TOL_LEGACY, "legacy packed")


def test_legacy_generator_threshold_roundtrip(key):
    # uniform-window generator output converts identically through exact
    # and threshold constructors (entries are already ±1)
    from smmb_tpu.formats import tcsc_from_dense, tcsc_from_dense_threshold
    from smmb_tpu.formats.tcsc import tcsc_to_dense

    w = np.asarray(rng.ternary_uniform_windows(key, (64, 96), non_zero=4))
    a = np.asarray(tcsc_to_dense(tcsc_from_dense(w)))
    b = np.asarray(tcsc_to_dense(tcsc_from_dense_threshold(w)))
    np.testing.assert_array_equal(a, b)
