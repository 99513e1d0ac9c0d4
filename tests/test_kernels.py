"""Pallas kernel parity tests (interpret mode on the CPU test mesh).

The kernel contract: identical results to the jnp oracle / dense oracle
within the reference fp32 tolerance (1e-4, /root/reference/dense/dense.c:43).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.kernels import packed_spmm
from smmb_tpu.ops import gemm, gemm_prelu
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close

ALPHA = 0.2


def _setup(seed, m, k, n, non_zero=2):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = rng.rand_dense(kx, (m, k))
    w = rng.rand_ternary(kw, (k, n), non_zero=non_zero)
    b = rng.rand_dense(kb, (n,))
    return x, np.asarray(w), b


@pytest.mark.parametrize(
    "m,k,n",
    [
        (1, 512, 1024),  # single-row (reference headline M=1 shape, scaled)
        (16, 512, 512),
        (8, 1024, 640),  # K spans two packed groups; N not block-aligned
        (100, 512, 512),  # M not aligned to 8
    ],
)
def test_packed_spmm_kernel_parity(m, k, n):
    x, w, b = _setup(11, m, k, n)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, block_m=32, block_n=256)
    assert_close(y, ref, TOL_DENSE, f"packed_spmm kernel {m}x{k}x{n}")


def test_packed_spmm_kernel_prelu():
    x, w, b = _setup(12, 8, 512, 512)
    ref = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, alpha=ALPHA, block_m=32, block_n=256)
    assert_close(y, ref, TOL_DENSE, "packed_spmm prelu")


def test_packed_spmm_kernel_no_bias():
    x, w, _ = _setup(13, 4, 512, 256)
    ref = gemm(x, jnp.asarray(w))
    p = pack_ternary(w)
    y = packed_spmm(x, p, block_m=32, block_n=256)
    assert_close(y, ref, TOL_DENSE, "packed_spmm no-bias")


def test_packed_spmm_kernel_short_k():
    # K smaller than one packed group: zero padding must be harmless
    x, w, b = _setup(14, 4, 100, 256)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, block_m=32, block_n=256)
    assert_close(y, ref, TOL_DENSE, "packed_spmm short K")


def test_packed_spmm_kernel_multi_ktile():
    # forces nk > 1 with block_k=512
    x, w, b = _setup(15, 8, 2048, 256)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, block_m=32, block_n=256, block_k=512)
    assert_close(y, ref, TOL_DENSE, "packed_spmm multi k-tile")


def test_packed_spmm_bf16_mode():
    # bf16 compute: W decodes exactly; error comes only from casting X.
    x, w, b = _setup(16, 8, 512, 256)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    y = packed_spmm(
        x, p, b, compute_dtype=jnp.bfloat16, block_m=32, block_n=256
    )
    # sqrt(K)·eps_bf16 scale tolerance
    assert_close(y, ref, 0.2, "packed_spmm bf16")
