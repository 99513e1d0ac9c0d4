"""Sharded packed-ternary SpMM over a device mesh (net-new layer).

Two weight partitionings, composing into the Megatron-style MLP pairing
(smmb_tpu/models/mlp.py):

* **column** — each model-shard owns a contiguous slice of output columns N.
  X is replicated over the model axis (batch-sharded over "data"); no
  collective is needed in the forward — each shard computes its own output
  panel. This is the TPU mapping of the reference's per-column work
  decomposition (the n-outer loop, /root/reference/sparse/tcsc.c:113).
* **row** — each model-shard owns a slice of the contraction axis K (a
  row-range of the weight matrix, i.e. a slice of packed groups). Shards
  compute partial products over their K range and combine with
  ``psum`` / ``psum_scatter`` over the model axis — the collective rides ICI.

Both run inside ``shard_map`` so the per-device body is the single-chip
Pallas kernel (smmb_tpu/kernels/packed_spmm.py) unchanged — collectives are
explicit, overlap is XLA's async-collective scheduling.

Sharding granularity: the packed layout stores 4 logical rows per packed row
in groups of 512 (formats/packed.py), so row-sharding requires each shard's
K-slice to be a multiple of 512 logical rows; column shards need lane-aligned
(128) N slices. ``shard_packed_*`` validate this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.formats.packed import GROUP_ROWS, TernaryPacked
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _model_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def shard_packed_columns(w: TernaryPacked, mesh: Mesh) -> TernaryPacked:
    """Place the packed planes column-sharded over the model axis."""
    nshard = _model_size(mesh)
    if w.cols % (nshard * 128):
        raise ValueError(
            f"cols={w.cols} must be a multiple of 128×model={nshard * 128}"
        )
    sh = NamedSharding(mesh, P(None, MODEL_AXIS))
    return TernaryPacked(
        data=jax.device_put(w.data, sh), rows=w.rows, cols=w.cols, nnz=w.nnz
    )


def shard_packed_rows(w: TernaryPacked, mesh: Mesh) -> TernaryPacked:
    """Place the packed planes row(K)-sharded over the model axis."""
    nshard = _model_size(mesh)
    if w.rows != w.padded_rows or (w.rows // GROUP_ROWS) % nshard:
        raise ValueError(
            f"K={w.rows} must be an exact multiple of model={nshard} packed "
            f"groups ({GROUP_ROWS} rows each) — row shards must align with "
            "the K-chunks of the sharded activations"
        )
    sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    return TernaryPacked(
        data=jax.device_put(w.data, sh), rows=w.rows, cols=w.cols, nnz=w.nnz
    )


def _local_spmm(x, data, b, alpha, compute_dtype, use_kernel, rows):
    """Per-device body: single-chip packed SpMM on the local shard."""
    w_local = TernaryPacked(
        data=data, rows=rows, cols=data.shape[1], nnz=-1
    )
    if use_kernel:
        return packed_spmm(
            x, w_local, b, alpha, compute_dtype=compute_dtype
        )
    return packed_spmm_jnp(x, w_local, b, alpha, dtype=compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "alpha", "compute_dtype", "use_kernel"),
)
def sharded_spmm_column(
    x: jax.Array,
    w: TernaryPacked,
    b: jax.Array | None,
    *,
    mesh: Mesh,
    alpha: float | None = None,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Column-parallel ``Y = prelu(X·W + B)``: Y comes back sharded
    (data, model); no forward collective."""
    if b is None:
        b = jnp.zeros((w.cols,), jnp.float32)

    def body(x_l, data_l, b_l):
        return _local_spmm(
            x_l, data_l, b_l, alpha, compute_dtype, use_kernel, w.rows
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(x, w.data, b)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "alpha", "compute_dtype", "use_kernel"),
)
def sharded_spmm_row(
    x: jax.Array,
    w: TernaryPacked,
    b: jax.Array | None,
    *,
    mesh: Mesh,
    alpha: float | None = None,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Row(K)-parallel SpMM: X arrives feature-sharded on the model axis
    (as produced by a preceding column-parallel layer), partial products are
    ``psum``-combined over ICI, epilogue applied after the reduction."""
    if b is None:
        b = jnp.zeros((w.cols,), jnp.float32)
    nshard = _model_size(mesh)
    rows_local = w.padded_rows // nshard

    def body(x_l, data_l, b_l):
        # bias and epilogue must come after the cross-shard reduction;
        # compute the local partial with neither.
        part = _local_spmm(
            x_l, data_l, None, None, compute_dtype, use_kernel, rows_local
        )
        y = jax.lax.psum(part, MODEL_AXIS) + b_l
        if alpha is not None:
            y = jnp.where(y > 0, y, alpha * y)
        return y

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),
            P(MODEL_AXIS, None),
            P(None),
        ),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(x, w.data, b)
