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


# ---------------------------------------------------------------- BCSR kernel


def _block_sparse_matrix(seed, k, n, r, c, keep=0.3):
    """Ternary matrix whose nonzeros live only in `keep` fraction of r×c
    blocks (some block rows/cols left fully empty)."""
    rs = np.random.RandomState(seed)
    w = np.zeros((k, n), np.float32)
    for bi in range(k // r):
        for bj in range(n // c):
            if rs.rand() < keep:
                blk = rs.choice(
                    [-1.0, 0.0, 1.0], size=(r, c), p=[0.25, 0.5, 0.25]
                )
                w[bi * r : (bi + 1) * r, bj * c : (bj + 1) * c] = blk
    return w


@pytest.mark.parametrize("x_resident", [True, False])
def test_bcsr_pallas_parity(x_resident):
    # both activation-staging modes: resident (bm, K) panel with in-kernel
    # block slicing vs per-block (bm, r) panel DMA
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

    w = _block_sparse_matrix(0, 512, 512, 8, 128)
    bm = bcsr_from_dense(w, 8, 128)
    assert bm.k > 0
    prep = bcsr_prepare(bm)
    kx, kb = jax.random.split(jax.random.PRNGKey(31))
    x = rng.rand_dense(kx, (16, 512))
    b = rng.rand_dense(kb, (512,))
    ref = gemm(x, jnp.asarray(w), b)
    y = bcsr_spmm_pallas(x, prep, b, x_resident=x_resident)
    assert_close(y, ref, TOL_DENSE, "bcsr pallas")
    # fused prelu — incl. activation of empty-column bias
    refp = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    yp = bcsr_spmm_pallas(x, prep, b, alpha=ALPHA, x_resident=x_resident)
    assert_close(yp, refp, TOL_DENSE, "bcsr pallas prelu")


def test_bcsr_pallas_mxu_blocks():
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

    w = _block_sparse_matrix(1, 512, 1024, 128, 128, keep=0.4)
    bm = bcsr_from_dense(w, 128, 128)
    prep = bcsr_prepare(bm)
    x = rng.rand_dense(jax.random.PRNGKey(32), (100, 512))  # M not aligned
    ref = gemm(x, jnp.asarray(w))
    y = bcsr_spmm_pallas(x, prep, None)
    assert_close(y, ref, TOL_DENSE, "bcsr pallas 128x128")


def test_bcsr_pallas_empty():
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

    bm = bcsr_from_dense(np.zeros((256, 256), np.float32), 8, 128)
    prep = bcsr_prepare(bm)
    x = jnp.ones((4, 256))
    b = jnp.arange(256, dtype=jnp.float32) - 128.0
    y = bcsr_spmm_pallas(x, prep, b, alpha=ALPHA)
    ref = np.where(np.asarray(b) > 0, np.asarray(b), ALPHA * np.asarray(b))
    np.testing.assert_allclose(np.asarray(y), np.tile(ref, (4, 1)), atol=1e-6)


def test_bcsr_pallas_block_validation():
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

    bm = bcsr_from_dense(np.zeros((64, 64), np.float32), 8, 8)
    prep = bcsr_prepare(bm)
    with pytest.raises(ValueError):
        bcsr_spmm_pallas(jnp.ones((4, 64)), prep, None)


def test_packed_spmm_w2a8_mode():
    # int8-activation serving mode: error budget set by 8-bit x quantization
    x, w, b = _setup(17, 64, 1024, 512)
    ref = gemm(x, jnp.asarray(w), b)
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, compute_dtype=jnp.int8)
    err = float(jnp.abs(y - ref).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.02 * scale + 0.1, f"w2a8 err {err} vs scale {scale}"
    # prelu fuses in the dequant epilogue
    refp = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
    yp = packed_spmm(x, p, b, alpha=ALPHA, compute_dtype=jnp.int8)
    errp = float(jnp.abs(yp - refp).max())
    assert errp < 0.02 * scale + 0.1


def test_packed_linear_vjp():
    # gradients through the frozen packed layer match dense-matmul autodiff
    from smmb_tpu.kernels.packed_vjp import (
        make_packed_linear,
        pack_with_transpose,
    )

    kx, kw, kb, kg = jax.random.split(jax.random.PRNGKey(41), 4)
    x = rng.rand_dense(kx, (8, 512))
    w = np.asarray(rng.rand_ternary(kw, (512, 256)))
    b = rng.rand_dense(kb, (256,))
    gy = rng.rand_dense(kg, (8, 256))

    wp, wtp = pack_with_transpose(w)
    layer = make_packed_linear(
        wp, wtp, alpha=ALPHA, compute_dtype=jnp.float32, use_kernel=False
    )

    def loss_packed(x, b):
        return jnp.sum(layer(x, b) * gy)

    def loss_dense(x, b):
        y = gemm_prelu(x, jnp.asarray(w), b, ALPHA)
        return jnp.sum(y * gy)

    y = layer(x, b)
    assert_close(y, gemm_prelu(x, jnp.asarray(w), b, ALPHA), TOL_DENSE)
    gx_p, gb_p = jax.grad(loss_packed, argnums=(0, 1))(x, b)
    gx_d, gb_d = jax.grad(loss_dense, argnums=(0, 1))(x, b)
    assert_close(gx_p, gx_d, 1e-3, "dx")
    assert_close(gb_p, gb_d, 1e-3, "db")


def test_pack_with_transpose_validation():
    from smmb_tpu.kernels.packed_vjp import (
        make_packed_linear,
        pack_with_transpose,
    )

    w = np.asarray(rng.rand_ternary(jax.random.PRNGKey(42), (64, 32)))
    wp, wtp = pack_with_transpose(w)
    with pytest.raises(ValueError):
        make_packed_linear(wp, wp)  # not a transpose


def test_packed_spmm_nd_input():
    # (batch, seq, features) activations flow through with dims preserved
    x3, w, b = _setup(18, 12, 512, 256)
    x3 = x3.reshape(3, 4, 512)
    ref = gemm(x3.reshape(-1, 512), jnp.asarray(w), b).reshape(3, 4, 256)
    p = pack_ternary(w)
    y = packed_spmm(x3, p, b, block_m=32, block_n=256)
    assert y.shape == (3, 4, 256)
    assert_close(y, ref, TOL_DENSE, "3D input")


def test_bcsr_pallas_large_batch():
    # regression: M > block_m must tile the batch, not silently truncate
    from smmb_tpu.formats.bcsr import bcsr_from_dense
    from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

    w = _block_sparse_matrix(3, 256, 512, 8, 128)
    bm = bcsr_from_dense(w, 8, 128)
    prep = bcsr_prepare(bm)
    x = rng.rand_dense(jax.random.PRNGKey(33), (140, 256))
    ref = gemm(x, jnp.asarray(w))
    y = bcsr_spmm_pallas(x, prep, None, block_m=64)
    assert_close(y, ref, TOL_DENSE, "bcsr pallas M>block_m")


@pytest.mark.parametrize("decode", ["fold", "scratch"])
@pytest.mark.parametrize("dtype", ["f32", "bf16", "int8"])
def test_packed_spmm_decode_variants(decode, dtype):
    # every decode strategy must match the dense oracle in every compute
    # mode (fold: folded 4^i plane scales divide back out exactly;
    # scratch: decode-to-VMEM + single full-depth dot)
    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[dtype]
    x, w, b = _setup(23, 5, 1024, 640)
    ref = np.asarray(x, np.float64) @ w.astype(np.float64) + np.asarray(
        b, np.float64
    )
    p = pack_ternary(w)
    y = packed_spmm(x, p, b, compute_dtype=dt, decode=decode)
    tol = {"f32": TOL_DENSE, "bf16": 0.2, "int8": 0.6}[dtype]
    assert_close(y, ref, tol, f"packed {decode} {dtype}")
    # fused prelu epilogue on top of each decode
    yp = packed_spmm(x, p, b, alpha=ALPHA, compute_dtype=dt, decode=decode)
    refp = np.where(ref > 0, ref, ALPHA * ref)
    assert_close(yp, refp, tol, f"packed {decode} {dtype} prelu")
