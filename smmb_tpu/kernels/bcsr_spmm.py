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

Usage: ``prep = bcsr_prepare(w)`` once (host-side column-major block sort +
2-bit value packing, the analog of format construction), then
``bcsr_spmm_pallas(x, prep, b, alpha)`` per call. Requirements: r a multiple
of 8 and c a multiple of 128 (tile alignment; MXU-tile r=128 is the fast
path — the packed codes then sit in full (32, 128) i8 tiles).
Small-block matrices (e.g. the reference's 8×8) should use the jnp path
(smmb_tpu.ops.bcsr_spmm), which is already MXU-based.
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

    ``values`` stores each block's ternary entries as 2-bit codes — the same
    central insight as ``TernaryPacked`` (16× less weight traffic per stored
    block than the round-1 float32 blocks): byte ``values[b, p, :]`` holds
    block rows ``p, r/4+p, 2r/4+p, 3r/4+p`` in its four 2-bit fields, decoded
    in-kernel by the int32 shift decode (see packed_spmm.py).
    """

    blk_row: jax.Array  # int32[k + 1]
    blk_col: jax.Array  # int32[k + 1]
    values: jax.Array  # int8[k, r // 4, c] (2-bit codes, 4 rows per byte)
    col_has_blocks: jax.Array  # float32[cols] (element granularity)
    rows: int
    cols: int
    r: int
    c: int
    k: int

    def weight_bytes(self) -> int:
        """HBM bytes per full weight read: packed codes + steering indices."""
        return self.k * (self.r // 4) * self.c + 2 * 4 * (self.k + 1)


def bcsr_prepare(w: BCSR) -> BCSRPrepared:
    """Host-side: permute blocks column-major for the kernel (one output tile
    per contiguous run) and pack block values to 2-bit codes."""
    rows = np.asarray(bcsr_block_rows(w))
    cols = np.asarray(w.b_col_idx)
    order = np.lexsort((rows, cols))  # sort by col, then row
    blk_row = np.concatenate([rows[order], [-1]]).astype(np.int32)
    blk_col = np.concatenate([cols[order], [-1]]).astype(np.int32)
    values = np.asarray(w.b_values)[order]  # (k, r, c) float ternary
    if w.r % 4:
        raise ValueError(f"bcsr_prepare needs r % 4 == 0, got r={w.r}")
    sub = w.r // 4
    t = np.zeros(values.shape, np.int8)
    t[values == 1.0] = 1
    t[values == -1.0] = -1
    codes = (t & 3).astype(np.uint8).reshape(len(values), 4, sub, w.c)
    packed = (
        codes[:, 0]
        | (codes[:, 1] << 2)
        | (codes[:, 2] << 4)
        | (codes[:, 3] << 6)
    ).astype(np.int8)
    has = np.zeros(w.bc, np.float32)
    has[cols] = 1.0
    has_elem = np.repeat(has, w.c)
    return BCSRPrepared(
        blk_row=jnp.asarray(blk_row),
        blk_col=jnp.asarray(blk_col),
        values=jnp.asarray(packed),
        col_has_blocks=jnp.asarray(has_elem),
        rows=w.rows,
        cols=w.cols,
        r=w.r,
        c=w.c,
        k=w.k,
    )


def _kernel(
    blk_row_ref, blk_col_ref, x_ref, v_ref, yin_ref, out_ref, wdec_ref,
    *, alpha, sub, x_resident
):
    i = pl.program_id(1)  # block index (grid dim 0 tiles M)
    col = blk_col_ref[i]
    prev_col = blk_col_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, col != prev_col)
    # out_ref holds this output tile's running sum while consecutive grid
    # steps revisit it; on the first visit seed from the bias-filled yin.
    base = jnp.where(first, yin_ref[:], out_ref[:])
    # f32 x must force HIGHEST or the MXU silently runs single-pass bf16,
    # breaking the 1e-4 parity contract
    precision = (
        jax.lax.Precision.HIGHEST
        if x_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # 2-bit block decode: int32 shift sign-extend (the measured-fastest
    # decode, see packed_spmm) into a (r, c) VMEM scratch, then ONE
    # full-depth MXU dot. Decoding into the scratch keeps all writes on the
    # cheap sublane axis; the earlier 4×(bm, sub)·(sub, c) sub-dot variant
    # sliced x on the LANE axis at offsets sub, 2·sub, 3·sub — cross-lane
    # relayouts that measured 109 µs vs 7.6 µs on the 2048² case (v5e,
    # 2026-08-17). Weight HBM traffic per stored block is ÷16 vs fp32.
    w32 = v_ref[0].astype(jnp.int32)
    for p in range(4):
        wdec_ref[p * sub : (p + 1) * sub, :] = (
            (w32 << (30 - 2 * p)) >> 30
        ).astype(wdec_ref.dtype)
    if x_resident:
        # x-resident mode (ROADMAP #5): the whole (bm, K) x panel sits in
        # VMEM for the M-tile; slice this block's (bm, r) piece at a
        # dynamic lane offset — always a multiple of 128 (r % 128 == 0),
        # so no cross-lane relayout. Kills the per-block x panel re-DMA
        # (~5× the dense x traffic at 30% block density).
        xs = x_ref[:, pl.ds(blk_row_ref[i] * (4 * sub), 4 * sub)]
    else:
        xs = x_ref[:]
    acc = base + jnp.dot(
        xs,
        wdec_ref[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if alpha is not None:
        last = blk_col_ref[i + 1] != col  # sentinel keeps i+1 in bounds
        acc = jnp.where(jnp.logical_and(last, acc < 0), alpha * acc, acc)
    # out (always f32 — see wrapper) carries partial sums between visits
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("alpha", "block_m", "interpret", "x_resident")
)
def bcsr_spmm_pallas(
    x: jax.Array,
    w: BCSRPrepared,
    b: jax.Array | None = None,
    alpha: float | None = None,
    *,
    block_m: int = 256,
    interpret: bool | None = None,
    x_resident: bool | None = None,
) -> jax.Array:
    """``Y = prelu(X @ W + B, alpha)`` over large-block BCSR weights.

    X: (M, K); W: prepared BCSR with rows=K, cols=N, r % 128 == 0,
    c % 128 == 0 (Mosaic requires the x-slice lane dim — r — and every
    block's last dim to be 128-aligned; verified on v5e 2026-08-17).
    Output columns holding no blocks come back as (activated) bias rows.

    ``x_resident`` keeps the full (block_m, K) activation panel in VMEM per
    M-tile and slices each block's (bm, r) piece in-kernel at a dynamic
    128-aligned lane offset, instead of re-DMAing the panel once per stored
    block (which costs ~(stored blocks per block-row)× the dense x
    traffic — the kernel's HBM floor at low M). None = auto: on when the
    panel fits in a 4 MB VMEM budget.
    """
    m, k = x.shape
    if k != w.rows:
        raise ValueError(f"x K dim {k} != weight rows {w.rows}")
    interp = use_interpret(interpret)
    if w.c % 128 or (not interp and w.r % 128):
        # Mosaic lowering needs 128-aligned lane dims; interpret mode
        # (CPU semantics tests) only needs the c alignment the packed
        # value layout itself assumes
        raise ValueError(
            f"kernel needs r%128==0 and c%128==0 blocks, got ({w.r},{w.c}); "
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
    # the output buffer carries partial sums between block visits — keep it
    # f32 regardless of x.dtype (bf16 partials rounded per visit measured
    # 4.4e-1 err at K=2048 on v5e; f32 carrier leaves only the x-cast noise)
    y_init = jnp.broadcast_to(seed_bias, (m, w.cols))
    if w.k == 0:
        return y_init.astype(x.dtype)

    bm = min(block_m, round_up(m, 8))
    mp = round_up(m, bm)
    xq = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    yq = jnp.pad(y_init, ((0, mp - m), (0, 0))) if mp != m else y_init
    if x_resident is None:
        x_resident = bm * k * x.dtype.itemsize <= 4 * 1024 * 1024

    # grid dim 0 tiles the batch (outer, so each M-tile walks all blocks in
    # column-major order); dim 1 walks the stored blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # blk_row, blk_col
        grid=(mp // bm, w.k),
        in_specs=[
            pl.BlockSpec(
                (bm, k), lambda mi, i, br, bc: (mi, 0),
                memory_space=pltpu.VMEM,
            )
            if x_resident
            else pl.BlockSpec(
                (bm, w.r), lambda mi, i, br, bc: (mi, br[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w.r // 4, w.c), lambda mi, i, br, bc: (i, 0, 0),
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
        scratch_shapes=[pltpu.VMEM((w.r, w.c), x.dtype)],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, alpha=alpha, sub=w.r // 4, x_resident=x_resident
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, w.cols), jnp.float32),
        input_output_aliases={4: 0},  # yq (5th input incl. scalars) -> out
        interpret=interp,
    )(w.blk_row, w.blk_col, xq, w.values, yq)
    out = out.astype(x.dtype)
    return out[:m] if mp != m else out
