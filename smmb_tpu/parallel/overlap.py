"""Collective matmul: activation exchange overlapped with SpMM compute.

The north-star requirement (BASELINE.json): "activation halo panels are
exchanged via reduce-scatter/all-gather collectives overlapped with the
Pallas SpMM compute". This module implements the all-gather side as a ring
collective matmul — the standard TPU pattern (see the scaling-book's
"collective matmul"):

A column-parallel layer fed by feature-sharded activations (the output of a
previous column layer) needs all of X. Instead of a blocking
``all_gather(x) -> spmm``, each device walks the ring: it computes the
partial product of the activation chunk it currently holds against the
matching K-rows of its weight shard while ``ppermute``-ing the chunk to its
neighbor. XLA schedules the ppermute DMA (ICI) concurrently with the Pallas
kernel of the same step, so communication hides behind compute whenever
``t_compute ≥ t_transfer`` per chunk.

The reduce-scatter side is ``psum_scatter`` in sharded_spmm_row's place when
the next layer wants feature-sharded input; XLA emits it from the same
shard_map body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from smmb_tpu.formats.packed import (
    GROUP_ROWS,
    VALUES_PER_BYTE,
    TernaryPacked,
)
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "alpha", "compute_dtype", "use_kernel"),
)
def sharded_spmm_column_overlapped(
    x: jax.Array,
    w: TernaryPacked,
    b: jax.Array | None,
    *,
    mesh: Mesh,
    alpha: float | None = None,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Column-parallel SpMM with ring-overlapped activation all-gather.

    x arrives feature-sharded over the model axis: shard d holds the K-chunk
    ``x[:, d*K/n : (d+1)*K/n]``. Output is (data, model)-sharded like
    sharded_spmm_column. The K-chunk size must align to packed groups
    (K/n % 512 == 0).
    """
    nshard = mesh.shape[MODEL_AXIS]
    if w.padded_rows != w.rows or w.rows % (nshard * GROUP_ROWS):
        raise ValueError(
            f"K={w.rows} must be a multiple of {nshard}×{GROUP_ROWS} "
            "for overlapped column-parallel"
        )
    if b is None:
        b = jnp.zeros((w.cols,), jnp.float32)
    rows_chunk = w.rows // nshard
    packed_chunk = rows_chunk // VALUES_PER_BYTE

    def body(x_l, data_l, b_l):
        n = jax.lax.axis_size(MODEL_AXIS)
        idx = jax.lax.axis_index(MODEL_AXIS)
        mrows = x_l.shape[0]
        cols_l = data_l.shape[1]
        acc = jnp.zeros((mrows, cols_l), jnp.float32)
        chunk = x_l
        perm = [(i, (i + 1) % nshard) for i in range(nshard)]
        for s in range(nshard):
            src = jax.lax.rem(idx - s + n, n)  # owner of the held chunk
            w_rows = jax.lax.dynamic_slice(
                data_l,
                (src * packed_chunk, 0),
                (packed_chunk, cols_l),
            )
            w_chunk = TernaryPacked(
                data=w_rows, rows=rows_chunk, cols=cols_l, nnz=-1
            )
            if s < nshard - 1:
                # start moving the chunk now; XLA overlaps the ICI DMA
                # with this step's kernel
                nxt = jax.lax.ppermute(chunk, MODEL_AXIS, perm)
            if use_kernel:
                part = packed_spmm(
                    chunk, w_chunk, None, None, compute_dtype=compute_dtype
                )
            else:
                part = packed_spmm_jnp(
                    chunk, w_chunk, None, None, dtype=compute_dtype
                )
            acc = acc + part.astype(jnp.float32)
            if s < nshard - 1:
                chunk = nxt
        y = acc + b_l
        if alpha is not None:
            y = jnp.where(y > 0, y, alpha * y)
        return y.astype(x_l.dtype)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,
    )(x, w.data, b)
