"""Kernel parity vs the dense oracle — the reference's core test contract.

Mirrors SURVEY.md §4: every sparse kernel is validated against ``gemm`` /
``gemm_prelu`` within the reference tolerances before anything is measured,
with seeded determinism added. Shapes include the reference's headline cases
scaled down plus non-aligned edge shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.bcsr import bcsr_from_dense
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.formats.tcsc import tcsc_from_dense, tcsc_pad_columns
from smmb_tpu.ops import (
    bcsr_spmm,
    bcsr_spmm_prelu,
    gemm,
    gemm_prelu,
    packed_spmm_jnp,
    prelu,
    tcsc_spmm,
    tcsc_spmm_padded,
    tcsc_spmm_prelu,
)
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close

ALPHA = 0.2  # /root/reference/main.cpp:268

CASES = [
    # (M, K, N, non_zero) — scaled-down versions of /root/reference/main.cpp:258-264
    (1, 64, 128, 2),
    (16, 128, 64, 2),
    (8, 96, 80, 8),  # non-aligned, lower density
    (4, 256, 256, 16),
]


def _setup(seed, m, k, n, non_zero):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = rng.rand_dense(kx, (m, k))
    w = rng.rand_ternary(kw, (k, n), non_zero=non_zero)
    b = rng.rand_dense(kb, (n,))
    return x, np.asarray(w), b


@pytest.mark.parametrize("m,k,n,nz", CASES)
def test_tcsc_spmm_parity(m, k, n, nz):
    x, w, b = _setup(1, m, k, n, nz)
    ref = gemm(x, jnp.asarray(w), b)
    t = tcsc_from_dense(w)
    assert_close(tcsc_spmm(x, t, b), ref, TOL_DENSE, "tcsc_spmm")
    # padded static-shape layout agrees too
    p = tcsc_pad_columns(t)
    assert_close(tcsc_spmm_padded(x, p, b), ref, TOL_DENSE, "tcsc_padded")


@pytest.mark.parametrize("m,k,n,nz", CASES)
def test_tcsc_spmm_prelu_parity(m, k, n, nz):
    x, w, b = _setup(2, m, k, n, nz)
    ref = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    t = tcsc_from_dense(w)
    assert_close(tcsc_spmm_prelu(x, t, b, ALPHA), ref, TOL_DENSE, "tcsc_prelu")


@pytest.mark.parametrize("m,k,n,nz", CASES)
def test_packed_spmm_parity(m, k, n, nz):
    x, w, b = _setup(3, m, k, n, nz)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    assert_close(packed_spmm_jnp(x, p, b), ref, TOL_DENSE, "packed_spmm")
    ref_p = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    assert_close(
        packed_spmm_jnp(x, p, b, alpha=ALPHA), ref_p, TOL_DENSE, "packed_prelu"
    )


@pytest.mark.parametrize(
    "m,k,n,nz,r,c",
    [
        (1, 64, 128, 2, 8, 8),  # test_bcsr.cpp-style case, scaled
        (16, 128, 64, 2, 8, 8),
        (4, 64, 64, 16, 1, 8),  # reference r=1,c=8 case (/root/reference/test/test_bcsr.cpp:25)
        (8, 96, 80, 8, 4, 4),
    ],
)
def test_bcsr_spmm_parity(m, k, n, nz, r, c):
    x, w, b = _setup(4, m, k, n, nz)
    ref = gemm(x, jnp.asarray(w), b)
    bm = bcsr_from_dense(w, r, c)
    assert_close(bcsr_spmm(x, bm, b), ref, TOL_DENSE, "bcsr_spmm")
    ref_p = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    assert_close(
        bcsr_spmm_prelu(x, bm, b, ALPHA), ref_p, TOL_DENSE, "bcsr_prelu"
    )


def test_bcsr_spmm_empty_matrix():
    x = jnp.ones((4, 16))
    b = jnp.arange(8, dtype=jnp.float32)
    bm = bcsr_from_dense(np.zeros((16, 8), np.float32), 4, 4)
    y = bcsr_spmm(x, bm, b)
    np.testing.assert_allclose(np.asarray(y), np.tile(np.asarray(b), (4, 1)))


def test_no_bias_paths():
    x, w, _ = _setup(5, 4, 64, 32, 2)
    ref = gemm(x, jnp.asarray(w))
    assert_close(tcsc_spmm(x, tcsc_from_dense(w)), ref, TOL_DENSE)
    assert_close(packed_spmm_jnp(x, pack_ternary(w)), ref, TOL_DENSE)
    assert_close(bcsr_spmm(x, bcsr_from_dense(w, 8, 8)), ref, TOL_DENSE)


def test_prelu_values():
    y = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(prelu(y, 0.25)), [-0.5, 0.0, 3.0])


def test_ops_jittable():
    x, w, b = _setup(6, 8, 64, 64, 2)
    t = tcsc_from_dense(w)
    p = pack_ternary(w)
    bm = bcsr_from_dense(w, 8, 8)
    ref = gemm(x, jnp.asarray(w), b)
    assert_close(jax.jit(tcsc_spmm)(x, t, b), ref, TOL_DENSE)
    assert_close(jax.jit(packed_spmm_jnp)(x, p, b), ref, TOL_DENSE)
    assert_close(jax.jit(bcsr_spmm)(x, bm, b), ref, TOL_DENSE)


def test_cross_variant_prelu_equivalence():
    # the reference cross-validates its 3 PReLU variants against each other
    # (/root/reference/main.cpp:358-366); here "separate" vs "fused"
    x, w, b = _setup(7, 8, 64, 64, 2)
    t = tcsc_from_dense(w)
    fused = tcsc_spmm_prelu(x, t, b, ALPHA)
    separate = prelu(tcsc_spmm(x, t, b), ALPHA)
    assert_close(fused, separate, 1e-6, "prelu variants")
