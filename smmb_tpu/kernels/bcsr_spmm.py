"""Pallas TPU kernel: BCSR block-sparse SpMM with fused bias + PReLU.

TPU-native re-design of the reference's AVX BCSR kernels
(/root/reference/sparse/bcsr.c:222-385). The reference's blocks are 8×8 (one
AVX register wide); on TPU the natural block is an MXU tile — 128×128 (or
larger multiples) — and "processing only non-zero blocks" becomes a grid over
the stored blocks with scalar-prefetched index arrays steering the DMA: the
block-row index picks the X panel, the block-column index picks the output
tile. Compute and HBM traffic scale with the number of stored blocks, not
with the dense shape — the same asymptotic win as the reference's CSR walk
(/root/reference/sparse/bcsr.c:155-173).

Usage: ``prep = bcsr_prepare(w)`` once (host-side column-major block sort,
the analog of format construction), then ``bcsr_spmm_pallas(x, prep, b,
alpha)`` per call. Requirements: r a multiple of 8 and c a multiple of 128
(tile alignment). Small-block matrices (e.g. the reference's 8×8) should use
the jnp path (smmb_tpu.ops.bcsr_spmm), which is already MXU-based.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.formats.bcsr import BCSR, bcsr_block_rows
from smmb_tpu.kernels._compat import use_interpret
from smmb_tpu.utils.shapes import round_up


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blk_row", "blk_col", "values", "col_has_blocks"],
    meta_fields=["rows", "cols", "r", "c", "k"],
)
@dataclasses.dataclass(frozen=True)
class BCSRPrepared:
    """Kernel-ready BCSR: blocks in column-major order + sentinel tail.

    ``blk_row``/``blk_col`` have length k+1 — entry k is a -1 sentinel so the
    kernel detects the last visit of each output tile without bounds checks.
    ``col_has_blocks`` (float 0/1 per block-column) marks output tiles that
    receive no contributions (they pass the bias through untouched).
    """

    blk_row: jax.Array  # int32[k + 1]
    blk_col: jax.Array  # int32[k + 1]
    values: jax.Array  # float32[k, r, c]
    col_has_blocks: jax.Array  # float32[cols] (element granularity)
    rows: int
    cols: int
    r: int
    c: int
    k: int


def bcsr_prepare(w: BCSR) -> BCSRPrepared:
    """Host-side: permute blocks column-major for the kernel (one output tile
    per contiguous run)."""
    rows = np.asarray(bcsr_block_rows(w))
    cols = np.asarray(w.b_col_idx)
    order = np.lexsort((rows, cols))  # sort by col, then row
    blk_row = np.concatenate([rows[order], [-1]]).astype(np.int32)
    blk_col = np.concatenate([cols[order], [-1]]).astype(np.int32)
    values = np.asarray(w.b_values)[order]
    has = np.zeros(w.bc, np.float32)
    has[cols] = 1.0
    has_elem = np.repeat(has, w.c)
    return BCSRPrepared(
        blk_row=jnp.asarray(blk_row),
        blk_col=jnp.asarray(blk_col),
        values=jnp.asarray(values),
        col_has_blocks=jnp.asarray(has_elem),
        rows=w.rows,
        cols=w.cols,
        r=w.r,
        c=w.c,
        k=w.k,
    )


def _kernel(blk_row_ref, blk_col_ref, x_ref, v_ref, yin_ref, out_ref, *, alpha):
    i = pl.program_id(1)  # block index (grid dim 0 tiles M)
    col = blk_col_ref[i]
    prev_col = blk_col_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, col != prev_col)
    # out_ref holds this output tile's running sum while consecutive grid
    # steps revisit it; on the first visit seed from the bias-filled yin.
    base = jnp.where(first, yin_ref[:], out_ref[:])
    acc = base + jnp.dot(
        x_ref[:], v_ref[0], preferred_element_type=jnp.float32
    )
    if alpha is not None:
        last = blk_col_ref[i + 1] != col  # sentinel keeps i+1 in bounds
        acc = jnp.where(jnp.logical_and(last, acc < 0), alpha * acc, acc)
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("alpha", "block_m", "interpret")
)
def bcsr_spmm_pallas(
    x: jax.Array,
    w: BCSRPrepared,
    b: jax.Array | None = None,
    alpha: float | None = None,
    *,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """``Y = prelu(X @ W + B, alpha)`` over large-block BCSR weights.

    X: (M, K); W: prepared BCSR with rows=K, cols=N, r % 8 == 0, c % 128 == 0.
    Output columns holding no blocks come back as (activated) bias rows.
    """
    m, k = x.shape
    if k != w.rows:
        raise ValueError(f"x K dim {k} != weight rows {w.rows}")
    if w.r % 8 or w.c % 128:
        raise ValueError(
            f"kernel needs r%8==0 and c%128==0 blocks, got ({w.r},{w.c}); "
            "use smmb_tpu.ops.bcsr_spmm for small blocks"
        )
    bias = (
        jnp.zeros((w.cols,), jnp.float32)
        if b is None
        else b.astype(jnp.float32)
    )
    if alpha is not None:
        # tiles with no blocks bypass the kernel epilogue: bake their
        # activation into the seed (touched tiles read the raw bias)
        act = jnp.where(bias > 0, bias, alpha * bias)
        seed_bias = jnp.where(w.col_has_blocks > 0, bias, act)
    else:
        seed_bias = bias
    y_init = jnp.broadcast_to(seed_bias, (m, w.cols)).astype(x.dtype)
    if w.k == 0:
        return y_init

    bm = min(block_m, round_up(m, 8))
    mp = round_up(m, bm)
    xq = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yq = jnp.pad(y_init, ((0, mp - m), (0, 0))) if mp != m else y_init

    # grid dim 0 tiles the batch (outer, so each M-tile walks all blocks in
    # column-major order); dim 1 walks the stored blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # blk_row, blk_col
        grid=(mp // bm, w.k),
        in_specs=[
            pl.BlockSpec(
                (bm, w.r), lambda mi, i, br, bc: (mi, br[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w.r, w.c), lambda mi, i, br, bc: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bm, w.c), lambda mi, i, br, bc: (mi, bc[i]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, w.c), lambda mi, i, br, bc: (mi, bc[i]),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, alpha=alpha),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, w.cols), x.dtype),
        input_output_aliases={4: 0},  # yq (5th input incl. scalars) -> out
        interpret=use_interpret(interpret),
    )(w.blk_row, w.blk_col, xq, w.values, yq)
    return out[:m] if mp != m else out
