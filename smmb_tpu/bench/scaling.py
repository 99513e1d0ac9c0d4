"""Multi-device scaling-efficiency harness (BASELINE.md reported points).

Measures sharded packed SpMM nnz/s at a series of mesh sizes and reports
scaling efficiency ``rate(N) / (N · rate(1))`` — the "≥85% nnz/s scaling
efficiency at 2+ hosts" metric. On CI this runs on the virtual CPU mesh
(numbers are not meaningful, the machinery is what's exercised); on a real
pod slice the same code reports ICI scaling.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.parallel.mesh import make_mesh
from smmb_tpu.parallel.sharded import (
    shard_packed_columns,
    sharded_spmm_column,
)
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class ScalePoint:
    devices: int
    mesh: str
    mean_s: float
    nnz_per_s: float
    efficiency: float  # vs linear scaling from the first point


def run_scaling(
    m: int = 256,
    k: int = 4096,
    n: int = 4096,
    non_zero: int = 10,
    mesh_shapes=((1, 1), (1, 2), (1, 4), (1, 8)),
    *,
    iters: int | None = None,
    reps: int = 3,
    use_kernel: bool | None = None,
) -> list[ScalePoint]:
    """Column-parallel SpMM over growing model-axis meshes.

    The weight matrix is held fixed; each model shard owns N/n_model output
    columns, so per-device work shrinks linearly and perfect scaling keeps
    walltime flat.
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = rng.rand_dense(kx, (m, k))
    w_np = np.asarray(rng.rand_ternary(kw, (k, n), non_zero=non_zero))
    b = rng.rand_dense(kb, (n,))
    p = pack_ternary(w_np)

    points: list[ScalePoint] = []
    base_rate = None
    base_dev = None
    for data, model in mesh_shapes:
        ndev = data * model
        if ndev > len(jax.devices()):
            continue
        mesh = make_mesh(data, model)
        ws = shard_packed_columns(p, mesh)

        def fn(x, data_arr, b):
            from smmb_tpu.formats.packed import TernaryPacked

            w_ = TernaryPacked(data=data_arr, rows=k, cols=n, nnz=p.nnz)
            return sharded_spmm_column(
                x, w_, b, mesh=mesh, use_kernel=use_kernel
            )

        meas = measure_device(fn, x, ws.data, b, iters=iters, reps=reps)
        rate = p.nnz * m / meas.mean_s
        if base_rate is None:
            base_rate, base_dev = rate, ndev
        eff = rate / (base_rate * ndev / base_dev)
        points.append(
            ScalePoint(ndev, f"{data}x{model}", meas.mean_s, rate, eff)
        )
    return points


def main():
    pts = run_scaling()
    for pt in pts:
        print(
            f"devices={pt.devices:2d} mesh={pt.mesh}  "
            f"t={pt.mean_s * 1e6:9.1f}us  nnz/s={pt.nnz_per_s:.3e}  "
            f"eff={pt.efficiency * 100:5.1f}%"
        )


if __name__ == "__main__":
    main()
