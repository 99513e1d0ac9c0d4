"""Reference-semantics sparse ops in pure jax.numpy.

These are the jittable, backend-portable (CPU/TPU) counterparts of the
reference's 15 CPU kernels (SURVEY.md §2 items 6-14) and the parity anchors
for the Pallas kernels in ``smmb_tpu.kernels``. Design notes:

- The TCSC inner loop ``y = B[n] + Σ X[m, idx_pos] − Σ X[m, idx_neg]``
  (/root/reference/sparse/tcsc.c:86-94) is a gather + segment-sum per column;
  on accelerators that is exactly ``jax.ops.segment_sum`` over the flat
  row-index planes with column ids recovered from the CSC pointers.
- The reference's three PReLU variants (basic / separate / on-the-go,
  /root/reference/sparse/tcsc.c:143-275) are *scheduling* variants of the same
  math; under XLA fusion they are one program, so a single fused op covers all
  three. The separate-vs-fused distinction only reappears at the Pallas level.
- ``bcsr_spmm_prelu`` applies PReLU post-hoc (mathematically correct). The
  reference's ``bcsr_sgemm_prelu_basic`` applies it per partial update
  (/root/reference/sparse/bcsr.c:177-218), which is NOT post-hoc PReLU and is
  never validated against a dense oracle there; we deliberately do not
  replicate that bug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smmb_tpu.formats.bcsr import BCSR, bcsr_block_rows
from smmb_tpu.formats.packed import TernaryPacked, decode_words
from smmb_tpu.formats.tcsc import TCSC, TCSCPadded
from smmb_tpu.ops.dense import prelu


def _segment_ids(col_start: jax.Array, n_elem: int, cols: int) -> jax.Array:
    """Recover the column id of every stored element from CSC pointers.

    Element e belongs to column j iff col_start[j] <= e < col_start[j+1];
    jittable via searchsorted (static shape n_elem).
    """
    e = jnp.arange(n_elem, dtype=jnp.int32)
    return (
        jnp.searchsorted(col_start, e, side="right").astype(jnp.int32) - 1
    )


def tcsc_spmm(
    x: jax.Array, w: TCSC, b: jax.Array | None = None
) -> jax.Array:
    """TCSC SpMM: ``Y = X·W + B`` with multiplication-free accumulation.

    Gather + segment-sum restructuring of /root/reference/sparse/tcsc.c:101-140
    (the "optimized" loop order): gather activation columns by row index, then
    segment-sum into output columns; +plane added, −plane subtracted.
    """
    cols = w.cols
    xt = x.T  # (K, M): row gathers along the contraction axis

    def plane(row_index, col_start, n_elem):
        if n_elem == 0:
            return jnp.zeros((cols, x.shape[0]), x.dtype)
        g = jnp.take(xt, row_index, axis=0)  # (n_elem, M)
        seg = _segment_ids(col_start, n_elem, cols)
        return jax.ops.segment_sum(g, seg, num_segments=cols)

    pos = plane(w.row_index_pos, w.col_start_pos, w.n_pos)
    neg = plane(w.row_index_neg, w.col_start_neg, w.n_neg)
    y = (pos - neg).T
    if b is not None:
        y = y + b
    return y


def tcsc_spmm_padded(
    x: jax.Array, w: TCSCPadded, b: jax.Array | None = None
) -> jax.Array:
    """TCSC SpMM over the static-shape padded layout.

    Padded entries index the appended zero row, so no masking is needed —
    the TPU answer to the ragged CSC walk (see formats/tcsc.py docstring).
    """
    m = x.shape[0]
    xe = jnp.concatenate([x.T, jnp.zeros((1, m), x.dtype)])  # sentinel row
    pos = jnp.take(xe, w.idx_pos, axis=0).sum(axis=1)  # (cols, M)
    neg = jnp.take(xe, w.idx_neg, axis=0).sum(axis=1)
    y = (pos - neg).T
    if b is not None:
        y = y + b
    return y


def tcsc_spmm_prelu(
    x: jax.Array, w: TCSC, b: jax.Array | None, alpha: float
) -> jax.Array:
    """Fused TCSC SpMM + PReLU — covers all three reference variants
    (basic /root/reference/sparse/tcsc.c:143-165, separate :179-227,
    on-the-go :231-275), which agree mathematically."""
    return prelu(tcsc_spmm(x, w, b), alpha)


def packed_spmm_jnp(
    x: jax.Array,
    w: TernaryPacked,
    b: jax.Array | None = None,
    alpha: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """2-bit packed ternary SpMM via full decompress + XLA matmul.

    The un-tiled semantics of the Pallas kernel
    (smmb_tpu/kernels/packed_spmm.py) — decompress the whole weight matrix
    then one MXU matmul. Used as its oracle and as a solid fallback wherever
    Pallas is unavailable.
    """
    if x.ndim > 2:
        lead = x.shape[:-1]
        y = packed_spmm_jnp(
            x.reshape(-1, x.shape[-1]), w, b, alpha, dtype
        )
        return y.reshape(*lead, y.shape[-1])
    k = x.shape[-1]
    wd = decode_words(w.data, dtype)[:k]
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    )  # f32 MXU matmuls default to single-pass bf16 — see ops/dense.py
    y = jnp.dot(
        x.astype(dtype),
        wd,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if b is not None:
        y = y + b
    if alpha is not None:
        y = prelu(y, alpha)
    return y.astype(x.dtype)


def bcsr_spmm(
    x: jax.Array, w: BCSR, b: jax.Array | None = None
) -> jax.Array:
    """BCSR SpMM: ``Y[:, bc*c:(bc+1)*c] += X[:, br*r:(br+1)*r] @ block``.

    Semantics of /root/reference/sparse/bcsr.c:141-175, restructured for XLA:
    gather the X panel for every stored block (batched over blocks), one
    batched (k, M, r)×(k, r, c) matmul on the MXU, then scatter-add the
    (k, M, c) results into output block-columns via segment_sum.
    """
    mrows = x.shape[0]
    if w.k == 0:
        y = jnp.zeros((mrows, w.cols), x.dtype)
        return y if b is None else y + b
    brows = bcsr_block_rows(w)  # (k,) block-row of each block
    # X reshaped to (br, r, M): panel gather by block row
    xp = x.T.reshape(w.br, w.r, mrows)
    xg = jnp.take(xp, brows, axis=0)  # (k, r, M)
    # (k, M, r) @ (k, r, c) -> (k, M, c)
    part = jax.lax.dot_general(
        xg,
        w.b_values,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # fp32 parity contract
    )  # (k, M, c)
    acc = jax.ops.segment_sum(part, w.b_col_idx, num_segments=w.bc)
    y = acc.transpose(1, 0, 2).reshape(mrows, w.cols).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def bcsr_spmm_prelu(
    x: jax.Array, w: BCSR, b: jax.Array | None, alpha: float
) -> jax.Array:
    """BCSR SpMM + post-hoc PReLU (corrected semantics — see module note)."""
    return prelu(bcsr_spmm(x, w, b), alpha)
