"""Seeded matrix generators reproducing the reference's random distributions.

The reference has two generator families:

1. ``dense/utils.h`` (modern path):
   - ``rands_dense`` — uniform floats in [-1, 1)   (/root/reference/dense/utils.h:9-16)
   - ``rands_sparse`` — ternary {-1, 0, +1} with
         P(+1) = P(-1) = 1 / (2 * non_zero),  P(0) = 1 - 1/non_zero
     so the expected density (nnz fraction) is 1/non_zero
     (/root/reference/dense/utils.h:36-68, semantics documented at
     /root/reference/dense/dense.c:21-27).

2. ``SparseGEMM.h`` (legacy course path):
   - ``initX`` — uniform integers in [-Range, Range] (/root/reference/SparseGEMM.h:43-51)
   - ``generateSparseMatrix`` with two modes (/root/reference/SparseGEMM.h:53-102):
     * "uniform": per row, each window of 2*nonZero consecutive columns gets
       exactly one +1 and one -1 at distinct random offsets.
     * "non-uniform": per row, ~W/(2*nonZero) +1s and -1s placed at random
       distinct columns, with a small random per-row imbalance.

Unlike the reference (unseeded ``random_device`` / ``time(0)``, so runs are
non-reproducible — see SURVEY.md §4), every generator here takes an explicit
``jax.random`` key: seeded determinism is part of this framework's test
contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rand_dense(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Uniform floats in [-1, 1). Ref: /root/reference/dense/utils.h:9-16."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1.0, maxval=1.0)


def rand_ternary(key: jax.Array, shape, non_zero: int = 2, dtype=jnp.float32) -> jax.Array:
    """Ternary matrix with P(+-1) = 1/(2*non_zero) each, P(0) = 1 - 1/non_zero.

    ``non_zero=2`` gives the reference's headline 50% density.
    Ref: /root/reference/dense/utils.h:36-68.
    """
    p_one = 1.0 / (2 * non_zero)
    p_zero = 1.0 - 1.0 / non_zero
    # categorical over (-1, 0, +1) with the reference's probabilities
    u = jax.random.uniform(key, shape)
    out = jnp.where(u < p_one, -1.0, jnp.where(u < p_one + p_zero, 0.0, 1.0))
    return out.astype(dtype)


def rand_int_dense(key: jax.Array, shape, value_range: int, dtype=jnp.float32) -> jax.Array:
    """Uniform integers in [-value_range, value_range], stored as floats.

    Ref: legacy ``initX`` /root/reference/SparseGEMM.h:43-51.
    """
    v = jax.random.randint(key, shape, -value_range, value_range + 1)
    return v.astype(dtype)


def ternary_uniform_windows(key: jax.Array, shape, non_zero: int, dtype=jnp.float32) -> jax.Array:
    """Legacy "uniform" ternary mode: one +1 and one -1 per 2*non_zero-wide
    window of each row, at distinct random offsets.

    Ref: /root/reference/SparseGEMM.h:56-70. Requires cols % (2*non_zero) == 0.
    """
    rows, cols = shape
    win = 2 * non_zero
    if cols % win != 0:
        raise ValueError(f"cols={cols} must be divisible by 2*non_zero={win}")
    nwin = cols // win
    kp, kn = jax.random.split(key)
    # position of the +1 in each window
    pos = jax.random.randint(kp, (rows, nwin), 0, win)
    # position of the -1: distinct from pos — sample an offset in [1, win)
    off = jax.random.randint(kn, (rows, nwin), 1, win)
    neg = (pos + off) % win
    base = jnp.zeros((rows, nwin, win), dtype=dtype)
    r = jnp.arange(rows)[:, None]
    w = jnp.arange(nwin)[None, :]
    base = base.at[r, w, pos].set(1.0)
    base = base.at[r, w, neg].set(-1.0)
    return base.reshape(rows, cols)


def ternary_nonuniform_rows(key: jax.Array, shape, non_zero: int, dtype=jnp.float32) -> np.ndarray:
    """Legacy "non-uniform" ternary mode: per row, ``cols/(2*non_zero) ± vari``
    +1s and the mirrored count of -1s at random distinct columns.

    Ref: /root/reference/SparseGEMM.h:71-99. Host-side (numpy) construction —
    this mirrors the reference's rejection-sampling loop, which is inherently
    sequential; matrices are built once on host then shipped to device.
    """
    rows, cols = shape
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rs = np.random.RandomState(seed)
    out = np.zeros((rows, cols), dtype=np.float32)
    vari_hi = cols // non_zero // 20 + 1
    for h in range(rows):
        pos_vari = rs.randint(0, vari_hi + 1)
        limit_pos = (cols // non_zero) // 2 + pos_vari
        limit_neg = (cols // non_zero) // 2 - pos_vari
        perm = rs.permutation(cols)
        out[h, perm[:limit_pos]] = 1.0
        out[h, perm[limit_pos:limit_pos + limit_neg]] = -1.0
    return out.astype(np.dtype(jnp.dtype(dtype).name) if dtype != jnp.bfloat16 else np.float32)
