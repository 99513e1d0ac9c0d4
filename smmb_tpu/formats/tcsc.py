"""TCSC — Ternary Compressed Sparse Column, as a pytree of device arrays.

Layout contract (mirrors the reference struct, /root/reference/sparse/tcsc.h:6-17):
two *independent* CSC index planes sharing the column axis, one for +1 entries
and one for -1 entries, with NO value array — values are implicit ±1, which is
what makes the SpMM inner loop multiplication-free.

    col_start_pos : int32[cols + 1]   CSC column pointers, +1 plane
    col_start_neg : int32[cols + 1]   CSC column pointers, -1 plane
    row_index_pos : int32[n_pos]      row indices of +1 entries (col-major order)
    row_index_neg : int32[n_neg]      row indices of -1 entries (col-major order)

Construction reproduces the reference's two-pass column-major scan with exact
±1.0 float matches (/root/reference/sparse/tcsc.c:6-66), vectorized on host
(numpy) instead of scalar loops — shapes are data-dependent, so construction is
a host-side preprocessing step; the resulting arrays are static-shaped device
residents. A C++ native constructor is available in ``smmb_tpu.runtime``.

TPU kernels do not consume this ragged layout directly: see
``tcsc_pad_columns`` (padded per-column index matrix, static shapes, sentinel
row pointing at a zero pad row) and ``smmb_tpu.formats.packed`` for the 2-bit
dense execution format.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.utils.shapes import round_up


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["col_start_pos", "col_start_neg", "row_index_pos", "row_index_neg"],
    meta_fields=["rows", "cols", "n_pos", "n_neg"],
)
@dataclasses.dataclass(frozen=True)
class TCSC:
    """Device-resident TCSC matrix (see module docstring for layout)."""

    col_start_pos: jax.Array  # int32[cols + 1]
    col_start_neg: jax.Array  # int32[cols + 1]
    row_index_pos: jax.Array  # int32[n_pos]
    row_index_neg: jax.Array  # int32[n_neg]
    rows: int
    cols: int
    n_pos: int
    n_neg: int

    @property
    def shape(self):
        return (self.rows, self.cols)

    @property
    def nnz(self) -> int:
        return self.n_pos + self.n_neg

    @property
    def density(self) -> float:
        return self.nnz / float(self.rows * self.cols)

    def index_bytes(self) -> int:
        """Bytes of index-plane traffic a kernel must read from HBM."""
        return 4 * (2 * (self.cols + 1) + self.n_pos + self.n_neg)


def _plane_from_dense(w: np.ndarray, value: float):
    """Column-major (j outer, i inner) scan for entries exactly equal to
    ``value`` — reference order, /root/reference/sparse/tcsc.c:48-63."""
    cols_hit, rows_hit = np.nonzero(w.T == value)  # sorted by (j, i)
    counts = np.bincount(cols_hit, minlength=w.shape[1])
    col_start = np.zeros(w.shape[1] + 1, dtype=np.int32)
    np.cumsum(counts, out=col_start[1:])
    return col_start, rows_hit.astype(np.int32)


def tcsc_from_dense(w) -> TCSC:
    """Dense (rows × cols) ternary matrix → TCSC.

    Exact float compares against ±1.0, like the reference
    (/root/reference/sparse/tcsc.c:54-57): anything not exactly ±1 is treated
    as zero.
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"expected 2D matrix, got shape {w.shape}")
    rows, cols = w.shape
    csp, rip = _plane_from_dense(w, 1.0)
    csn, rin = _plane_from_dense(w, -1.0)
    return TCSC(
        col_start_pos=jnp.asarray(csp),
        col_start_neg=jnp.asarray(csn),
        row_index_pos=jnp.asarray(rip),
        row_index_neg=jnp.asarray(rin),
        rows=rows,
        cols=cols,
        n_pos=int(len(rip)),
        n_neg=int(len(rin)),
    )


def tcsc_to_dense(t: TCSC) -> jax.Array:
    """Round-trip back to a dense float32 matrix (no reference counterpart —
    the reference never converts back; used for parity tests)."""
    csp = np.asarray(t.col_start_pos)
    csn = np.asarray(t.col_start_neg)
    rip = np.asarray(t.row_index_pos)
    rin = np.asarray(t.row_index_neg)
    w = np.zeros((t.rows, t.cols), dtype=np.float32)
    col_pos = np.repeat(np.arange(t.cols), np.diff(csp))
    col_neg = np.repeat(np.arange(t.cols), np.diff(csn))
    w[rip, col_pos] = 1.0
    w[rin, col_neg] = -1.0
    return jnp.asarray(w)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx_pos", "idx_neg", "cnt_pos", "cnt_neg"],
    meta_fields=["rows", "cols", "pad_pos", "pad_neg"],
)
@dataclasses.dataclass(frozen=True)
class TCSCPadded:
    """Static-shape per-column index planes for TPU kernels.

    ``idx_pos[j, :cnt_pos[j]]`` are the +1 row indices of column j; entries at
    and beyond ``cnt_pos[j]`` equal ``rows`` — a sentinel pointing at a zero
    pad row appended to the activation panel, so padded gathers contribute 0
    and the kernel needs no masking. This is the TPU answer to the ragged
    ``col_start``/``row_index`` walk in /root/reference/sparse/tcsc.c:113-137.
    """

    idx_pos: jax.Array  # int32[cols, pad_pos]
    idx_neg: jax.Array  # int32[cols, pad_neg]
    cnt_pos: jax.Array  # int32[cols]
    cnt_neg: jax.Array  # int32[cols]
    rows: int
    cols: int
    pad_pos: int
    pad_neg: int


def tcsc_pad_columns(t: TCSC, multiple: int = 8) -> TCSCPadded:
    """TCSC → padded per-column index matrices (host-side transform)."""
    out = {}
    for name, cs, ri in (
        ("pos", np.asarray(t.col_start_pos), np.asarray(t.row_index_pos)),
        ("neg", np.asarray(t.col_start_neg), np.asarray(t.row_index_neg)),
    ):
        counts = np.diff(cs)
        pad = max(int(counts.max()) if len(counts) else 0, 1)
        pad = round_up(pad, multiple)
        idx = np.full((t.cols, pad), t.rows, dtype=np.int32)  # sentinel = rows
        # scatter each column's slice into its padded row
        cols_rep = np.repeat(np.arange(t.cols), counts)
        offsets = np.arange(len(ri)) - np.repeat(cs[:-1], counts)
        idx[cols_rep, offsets] = ri
        out[name] = (idx, counts.astype(np.int32), pad)
    return TCSCPadded(
        idx_pos=jnp.asarray(out["pos"][0]),
        idx_neg=jnp.asarray(out["neg"][0]),
        cnt_pos=jnp.asarray(out["pos"][1]),
        cnt_neg=jnp.asarray(out["neg"][1]),
        rows=t.rows,
        cols=t.cols,
        pad_pos=out["pos"][2],
        pad_neg=out["neg"][2],
    )
