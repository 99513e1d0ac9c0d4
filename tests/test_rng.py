"""Generator distribution tests (reference semantics, seeded).

The reference's generators are unseeded and non-reproducible (SURVEY.md §4);
ours take explicit keys and these tests pin both determinism and the
distributional contracts from /root/reference/dense/utils.h:36-68 and
/root/reference/SparseGEMM.h:43-102.
"""

import jax
import numpy as np

from smmb_tpu.utils import rng


def test_rand_dense_range(key):
    x = np.asarray(rng.rand_dense(key, (256, 256)))
    assert x.min() >= -1.0 and x.max() < 1.0
    assert abs(x.mean()) < 0.02


def test_rand_ternary_density(key):
    # P(nnz) = 1/non_zero, split evenly between ±1
    for non_zero in (2, 8, 16):
        w = np.asarray(rng.rand_ternary(key, (512, 512), non_zero=non_zero))
        assert set(np.unique(w)) <= {-1.0, 0.0, 1.0}
        density = np.count_nonzero(w) / w.size
        assert abs(density - 1.0 / non_zero) < 0.01
        pos = (w == 1.0).sum()
        neg = (w == -1.0).sum()
        assert abs(pos - neg) / max(pos + neg, 1) < 0.05


def test_rand_ternary_deterministic(key):
    a = np.asarray(rng.rand_ternary(key, (64, 64)))
    b = np.asarray(rng.rand_ternary(key, (64, 64)))
    np.testing.assert_array_equal(a, b)


def test_rand_int_dense(key):
    x = np.asarray(rng.rand_int_dense(key, (128, 128), value_range=4))
    assert x.min() >= -4 and x.max() <= 4
    assert np.all(x == np.round(x))


def test_ternary_uniform_windows(key):
    # exactly one +1 and one -1 per 2*non_zero window of each row
    # (/root/reference/SparseGEMM.h:56-70)
    non_zero = 4
    w = np.asarray(rng.ternary_uniform_windows(key, (32, 64), non_zero))
    win = 2 * non_zero
    v = w.reshape(32, 64 // win, win)
    np.testing.assert_array_equal((v == 1.0).sum(-1), 1)
    np.testing.assert_array_equal((v == -1.0).sum(-1), 1)


def test_ternary_nonuniform_rows(key):
    # ~cols/(2*non_zero) +1s per row with bounded variation
    # (/root/reference/SparseGEMM.h:71-99)
    non_zero = 4
    cols = 256
    w = rng.ternary_nonuniform_rows(key, (64, cols), non_zero)
    base = (cols // non_zero) // 2
    vari_hi = cols // non_zero // 20 + 1
    pos = (w == 1.0).sum(axis=1)
    neg = (w == -1.0).sum(axis=1)
    assert np.all(pos + neg <= cols // non_zero + 1)
    assert np.all(np.abs(pos - base) <= vari_hi)
    assert np.all(pos - base == base - neg)  # mirrored imbalance
