"""BCSR — Block Compressed Sparse Row, as a pytree of device arrays.

Layout contract (mirrors the reference struct, /root/reference/sparse/bcsr.h:5-12):
the K×N ternary weight matrix is tiled into r×c blocks; only blocks containing
at least one ±1 are stored.

    b_row_start : int32[br + 1]       CSR pointers over block rows (br = K//r)
    b_col_idx   : int32[k]            block-column of each stored block
    b_values    : float32[k, r, c]    explicit block values (keeps ±1/0 floats)

SpMM semantics (reference loop, /root/reference/sparse/bcsr.c:141-175):
``Y[m, bc*c + j] += X[m, br*r + i] * b_values[bi, i, j]`` — i.e. each stored
block is a dense r×c sub-matrix of W and contributes ``X_block @ W_block``.

NOTE: the reference's constructor has a latent bug — ``b_row_start`` is only
advanced for block-rows containing ≥1 block (/root/reference/sparse/bcsr.c:101-117),
so an all-zero block row corrupts the CSR pointers. This implementation uses a
standard cumulative-count row pointer and is correct for empty block rows;
``tests/test_formats.py`` covers that case deliberately (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["b_row_start", "b_col_idx", "b_values"],
    meta_fields=["rows", "cols", "r", "c", "br", "bc", "k"],
)
@dataclasses.dataclass(frozen=True)
class BCSR:
    """Device-resident BCSR matrix (see module docstring for layout)."""

    b_row_start: jax.Array  # int32[br + 1]
    b_col_idx: jax.Array  # int32[k]
    b_values: jax.Array  # float32[k, r, c]
    rows: int  # K
    cols: int  # N
    r: int  # block rows
    c: int  # block cols
    br: int  # grid rows = rows // r
    bc: int  # grid cols = cols // c
    k: int  # number of stored blocks

    @property
    def shape(self):
        return (self.rows, self.cols)

    @property
    def nnz(self) -> int:
        """Stored elements (incl. explicit zeros inside kept blocks)."""
        return self.k * self.r * self.c

    def value_bytes(self) -> int:
        return 4 * self.k * self.r * self.c + 4 * (self.br + 1 + self.k)


def bcsr_from_dense(w, r: int, c: int) -> BCSR:
    """Dense (K × N) ternary matrix → BCSR with r×c blocks.

    A block is kept iff it contains an entry exactly equal to ±1.0 — the
    reference's validity test (/root/reference/sparse/bcsr.c:56-63). Requires
    K % r == 0 and N % c == 0, like the (commented-out) reference asserts
    (/root/reference/sparse/bcsr.c:20-21).
    """
    w = np.asarray(w, dtype=np.float32)
    rows, cols = w.shape
    if rows % r or cols % c:
        raise ValueError(f"shape {w.shape} not divisible by block ({r}, {c})")
    br, bc = rows // r, cols // c
    # (br, bc, r, c) view: block grid outer, block interior inner
    blocks = w.reshape(br, r, bc, c).transpose(0, 2, 1, 3)
    valid = np.any((blocks == 1.0) | (blocks == -1.0), axis=(2, 3))  # (br, bc)
    brow_hit, bcol_hit = np.nonzero(valid)  # row-major order == reference scan order
    k = len(bcol_hit)
    counts = np.bincount(brow_hit, minlength=br)
    b_row_start = np.zeros(br + 1, dtype=np.int32)
    np.cumsum(counts, out=b_row_start[1:])
    b_values = blocks[brow_hit, bcol_hit].astype(np.float32)  # (k, r, c)
    return BCSR(
        b_row_start=jnp.asarray(b_row_start),
        b_col_idx=jnp.asarray(bcol_hit.astype(np.int32)),
        b_values=jnp.asarray(b_values),
        rows=rows,
        cols=cols,
        r=r,
        c=c,
        br=br,
        bc=bc,
        k=int(k),
    )


def bcsr_to_dense(m: BCSR) -> jax.Array:
    """Round-trip back to dense float32 (parity-test helper; the reference
    never converts back)."""
    row_start = np.asarray(m.b_row_start)
    col_idx = np.asarray(m.b_col_idx)
    vals = np.asarray(m.b_values)
    w = np.zeros((m.rows, m.cols), dtype=np.float32)
    block_rows = np.repeat(np.arange(m.br), np.diff(row_start))
    for bi in range(m.k):
        i0 = block_rows[bi] * m.r
        j0 = int(col_idx[bi]) * m.c
        w[i0 : i0 + m.r, j0 : j0 + m.c] = vals[bi]
    return jnp.asarray(w)


def bcsr_block_rows(m: BCSR) -> jax.Array:
    """int32[k] block-row index of every stored block (device-computable).

    The expanded (COO-style) form of ``b_row_start``; TPU kernels prefer this
    flat indexing over the ragged CSR walk in /root/reference/sparse/bcsr.c:157.
    """
    e = jnp.arange(m.k, dtype=jnp.int32)
    return (
        jnp.searchsorted(m.b_row_start, e, side="right").astype(jnp.int32) - 1
    )
