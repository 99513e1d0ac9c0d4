"""Property/fuzz tests: adversarial ternary patterns through every format.

The reference only ever tests uniform-random matrices (SURVEY.md §4); these
cover the structural extremes where index-plane/packing bugs live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smmb_tpu.formats.bcsr import bcsr_from_dense, bcsr_to_dense
from smmb_tpu.formats.packed import pack_ternary, unpack_ternary
from smmb_tpu.formats.tcsc import (
    tcsc_from_dense,
    tcsc_pad_columns,
    tcsc_to_dense,
)
from smmb_tpu.ops import gemm, packed_spmm_jnp, tcsc_spmm, tcsc_spmm_padded
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, assert_close


def _patterns(k, n):
    yield "all_zero", np.zeros((k, n), np.float32)
    yield "all_pos", np.ones((k, n), np.float32)
    yield "all_neg", -np.ones((k, n), np.float32)
    cb = np.indices((k, n)).sum(axis=0) % 2
    yield "checkerboard", (cb * 2.0 - 1.0).astype(np.float32)
    one = np.zeros((k, n), np.float32)
    one[k // 2, n // 2] = -1.0
    yield "single_neg", one
    first_col = np.zeros((k, n), np.float32)
    first_col[:, 0] = 1.0
    yield "dense_first_col", first_col
    last_row = np.zeros((k, n), np.float32)
    last_row[-1, :] = -1.0
    yield "dense_last_row", last_row


@pytest.mark.parametrize("k,n", [(64, 48), (512, 128)])
def test_format_roundtrips_on_patterns(k, n):
    for name, w in _patterns(k, n):
        t = tcsc_from_dense(w)
        np.testing.assert_array_equal(
            np.asarray(tcsc_to_dense(t)), w, err_msg=f"tcsc {name}"
        )
        p = pack_ternary(w)
        np.testing.assert_array_equal(
            np.asarray(unpack_ternary(p)), w, err_msg=f"packed {name}"
        )
        if k % 8 == 0 and n % 8 == 0:
            m = bcsr_from_dense(w, 8, 8)
            np.testing.assert_array_equal(
                np.asarray(bcsr_to_dense(m)), w, err_msg=f"bcsr {name}"
            )


def test_spmm_on_patterns():
    k, n = 64, 48
    x = rng.rand_dense(jax.random.PRNGKey(0), (4, k))
    for name, w in _patterns(k, n):
        ref = gemm(x, jnp.asarray(w))
        t = tcsc_from_dense(w)
        assert_close(tcsc_spmm(x, t), ref, TOL_DENSE, f"tcsc_spmm {name}")
        assert_close(
            tcsc_spmm_padded(x, tcsc_pad_columns(t)),
            ref,
            TOL_DENSE,
            f"tcsc_padded {name}",
        )
        assert_close(
            packed_spmm_jnp(x, pack_ternary(w)),
            ref,
            TOL_DENSE,
            f"packed {name}",
        )


def test_random_shapes_fuzz():
    rs = np.random.RandomState(0)
    for trial in range(10):
        m = int(rs.randint(1, 33))
        k = int(rs.randint(1, 300))
        n = int(rs.randint(1, 200))
        nz = int(rs.choice([1, 2, 8]))
        kx, kw = jax.random.split(jax.random.PRNGKey(trial))
        x = rng.rand_dense(kx, (m, k))
        w = np.asarray(rng.rand_ternary(kw, (k, n), non_zero=nz))
        ref = gemm(x, jnp.asarray(w))
        assert_close(
            tcsc_spmm(x, tcsc_from_dense(w)),
            ref,
            TOL_DENSE,
            f"fuzz tcsc {m}x{k}x{n}",
        )
        assert_close(
            packed_spmm_jnp(x, pack_ternary(w)),
            ref,
            TOL_DENSE,
            f"fuzz packed {m}x{k}x{n}",
        )


def test_bf16_inputs_flow_through():
    # a user feeding bf16 activations end-to-end must get bf16 out
    from smmb_tpu.kernels import packed_spmm

    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = rng.rand_dense(kx, (8, 512)).astype(jnp.bfloat16)
    w = np.asarray(rng.rand_ternary(kw, (512, 256)))
    p = pack_ternary(w)
    y = packed_spmm(x, p, compute_dtype=jnp.bfloat16, block_m=32, block_n=256)
    assert y.dtype == jnp.bfloat16
    ref = gemm(x.astype(jnp.float32), jnp.asarray(w))
    err = float(jnp.abs(y.astype(jnp.float32) - ref).max())
    assert err < 0.25 * max(1.0, float(jnp.abs(ref).max()))
