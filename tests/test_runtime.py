"""Native C++ runtime parity: same results as the numpy constructors."""

import jax
import numpy as np
import pytest

from smmb_tpu.formats.bcsr import bcsr_from_dense
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.formats.tcsc import tcsc_from_dense
from smmb_tpu.runtime import (
    bcsr_from_dense_native,
    native_available,
    pack_ternary_native,
    tcsc_from_dense_native,
)
from smmb_tpu.utils import rng

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def _ternary(seed, shape, non_zero=2):
    return np.asarray(
        rng.rand_ternary(jax.random.PRNGKey(seed), shape, non_zero=non_zero)
    )


def test_native_tcsc_matches_numpy():
    w = _ternary(0, (1000, 257))
    a = tcsc_from_dense(w)
    b = tcsc_from_dense_native(w)
    np.testing.assert_array_equal(np.asarray(a.col_start_pos), np.asarray(b.col_start_pos))
    np.testing.assert_array_equal(np.asarray(a.col_start_neg), np.asarray(b.col_start_neg))
    np.testing.assert_array_equal(np.asarray(a.row_index_pos), np.asarray(b.row_index_pos))
    np.testing.assert_array_equal(np.asarray(a.row_index_neg), np.asarray(b.row_index_neg))


def test_native_pack_matches_numpy():
    w = _ternary(1, (700, 130))
    a = pack_ternary(w)
    b = pack_ternary_native(w)
    assert a.nnz == b.nnz
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_native_bcsr_matches_numpy():
    w = _ternary(2, (64, 96), non_zero=16)
    a = bcsr_from_dense(w, 8, 8)
    b = bcsr_from_dense_native(w, 8, 8)
    assert a.k == b.k
    np.testing.assert_array_equal(np.asarray(a.b_row_start), np.asarray(b.b_row_start))
    np.testing.assert_array_equal(np.asarray(a.b_col_idx), np.asarray(b.b_col_idx))
    np.testing.assert_array_equal(np.asarray(a.b_values), np.asarray(b.b_values))


def test_native_bcsr_zero_block_row():
    w = np.zeros((12, 8), np.float32)
    w[0, 0] = 1.0
    w[9, 5] = -1.0
    m = bcsr_from_dense_native(w, 4, 4)
    np.testing.assert_array_equal(np.asarray(m.b_row_start), [0, 1, 1, 2])
