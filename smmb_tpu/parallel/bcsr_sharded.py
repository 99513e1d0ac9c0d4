"""Column-sharded BCSR SpMM over a device mesh (net-new; no ref analog).

Extends the mesh partitioner (parallel/sharded.py) to the BCSR format:
each model shard owns a contiguous range of block-columns — the BCSR
analog of the TCSC column partitioning — and runs the unchanged
single-chip Pallas kernel (kernels/bcsr_spmm.py) on its local block list
inside ``shard_map``. Like ``sharded_spmm_column`` there is no forward
collective: outputs come back (data, model)-sharded.

The ragged-to-static problem (SURVEY.md §7 step 5, "padding-without-
waste", at block granularity): stored-block counts differ per column
range, but ``shard_map`` needs one static shape per operand. Every
shard's block list is padded to the fleet-wide max count with zero-valued
dummy blocks appended to the shard's *last occupied* block-column, so
they extend that column's contiguous visit run: the epilogue moves from
the real last visit to the final dummy (applied exactly once — PReLU is
NOT idempotent, ``prelu(prelu(y)) == alpha²·y`` for negative ``y``, so
"apply twice" is never acceptable), the dummy dots contribute exactly
zero, and the kernel's column-major invariant is preserved. A shard with
no real blocks aims its dummies at its last block-column and that column
is *marked occupied* in ``col_has_blocks``, so its tile seeds with the
raw (un-activated) bias and the final dummy's epilogue activates it once
— exact for any ``alpha``. Cost: ``kmax - k_s`` wasted grid steps on
shard ``s`` — zero at uniform block density, bounded by the density skew
otherwise.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.kernels.bcsr_spmm import BCSRPrepared, bcsr_spmm_pallas
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blk_row", "blk_col", "values", "col_has_blocks"],
    meta_fields=["rows", "cols", "r", "c", "kmax", "nshard"],
)
@dataclasses.dataclass(frozen=True)
class BCSRColumnShards:
    """Model-axis stack of per-shard kernel-ready BCSR block lists.

    Leading axis = model shard. ``blk_col`` entries are shard-local
    (rebased to the shard's column-range origin); ``kmax`` is the padded
    per-shard block count (fleet-wide max of real counts).
    """

    blk_row: jax.Array  # int32[S, kmax + 1]
    blk_col: jax.Array  # int32[S, kmax + 1] (shard-local, -1 sentinel)
    values: jax.Array  # int8[S, kmax, r // 4, c] (2-bit codes)
    col_has_blocks: jax.Array  # float32[S, cols // S]
    rows: int
    cols: int
    r: int
    c: int
    kmax: int
    nshard: int


def shard_bcsr_columns(prep: BCSRPrepared, mesh: Mesh) -> BCSRColumnShards:
    """Partition a prepared BCSR by block-column range over the model axis.

    Host-side (numpy): splits the column-major block list at shard
    boundaries, rebases column indices, pads each shard to the max count
    (see module docstring), and places the stacks model-sharded.
    """
    nshard = mesh.shape[MODEL_AXIS]
    if prep.cols % (nshard * prep.c):
        raise ValueError(
            f"cols={prep.cols} must be a multiple of c×model="
            f"{nshard * prep.c} for block-column sharding"
        )
    cols_local = prep.cols // nshard
    bc_local = cols_local // prep.c
    rows_np = np.asarray(prep.blk_row)[:-1]
    cols_np = np.asarray(prep.blk_col)[:-1]
    vals_np = np.asarray(prep.values)
    has_np = np.asarray(prep.col_has_blocks).reshape(nshard, cols_local)

    shard_of = cols_np // bc_local
    counts = np.bincount(shard_of, minlength=nshard)
    kmax = max(int(counts.max()) if len(cols_np) else 0, 1)

    sub = prep.r // 4
    br = np.zeros((nshard, kmax + 1), np.int32)
    bc = np.full((nshard, kmax + 1), -1, np.int32)
    vv = np.zeros((nshard, kmax, sub, prep.c), np.int8)
    has_np = has_np.copy()
    for s in range(nshard):
        sel = shard_of == s
        ks = int(counts[s])
        local_cols = cols_np[sel] - s * bc_local
        # dummies extend the last occupied column's visit run; an empty
        # shard aims them at its last block-column and marks it occupied,
        # so the tile seeds with the RAW bias and the final dummy's
        # epilogue activates it exactly once (see module docstring)
        pad_col = int(local_cols[-1]) if ks else bc_local - 1
        if ks < kmax:
            has_np[s, pad_col * prep.c : (pad_col + 1) * prep.c] = 1.0
        br[s, :ks] = rows_np[sel]
        br[s, ks:kmax] = 0
        bc[s, :ks] = local_cols
        bc[s, ks:kmax] = pad_col
        vv[s, :ks] = vals_np[sel]

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    return BCSRColumnShards(
        blk_row=put(jnp.asarray(br), P(MODEL_AXIS, None)),
        blk_col=put(jnp.asarray(bc), P(MODEL_AXIS, None)),
        values=put(jnp.asarray(vv), P(MODEL_AXIS, None, None, None)),
        col_has_blocks=put(jnp.asarray(has_np), P(MODEL_AXIS, None)),
        rows=prep.rows,
        cols=prep.cols,
        r=prep.r,
        c=prep.c,
        kmax=kmax,
        nshard=nshard,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "alpha", "block_m", "x_resident"),
)
def sharded_bcsr_spmm(
    x: jax.Array,
    w: BCSRColumnShards,
    b: jax.Array | None = None,
    *,
    mesh: Mesh,
    alpha: float | None = None,
    block_m: int = 256,
    x_resident: bool | None = None,
) -> jax.Array:
    """Block-column-parallel ``Y = prelu(X @ W + B, alpha)`` on the mesh.

    X is batch-sharded over "data" and replicated over "model"; each model
    shard runs the single-chip kernel on its block-column range; Y comes
    back (data, model)-sharded with no forward collective.
    """
    if b is None:
        b = jnp.zeros((w.cols,), jnp.float32)
    cols_local = w.cols // w.nshard

    def body(x_l, br_l, bc_l, vv_l, has_l, b_l):
        prep = BCSRPrepared(
            blk_row=br_l[0],
            blk_col=bc_l[0],
            values=vv_l[0],
            col_has_blocks=has_l[0],
            rows=w.rows,
            cols=cols_local,
            r=w.r,
            c=w.c,
            k=w.kmax,
        )
        return bcsr_spmm_pallas(
            x_l, prep, b_l, alpha=alpha, block_m=block_m,
            x_resident=x_resident,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),
            P(MODEL_AXIS, None),
            P(MODEL_AXIS, None),
            P(MODEL_AXIS, None, None, None),
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(x, w.blk_row, w.blk_col, w.values, w.col_has_blocks, b)
