"""Multi-layer ternary MLP serving benchmark (BASELINE.json config 5).

Measures the packed MLP forward end-to-end: per-layer Pallas SpMM with fused
PReLU, single chip and (where devices exist) mesh-sharded. Reports tokens/s
(batch rows through the full depth), per-layer effective nnz/s, and the
bytes-based roofline fraction of the whole forward.

CLI: python -m smmb_tpu mlp [--depth 4] [--dim 4096] [--batch 256]
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.bench.roofline import chip_spec
from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    mlp_forward_sharded,
    pack_mlp,
    shard_mlp,
)
from smmb_tpu.parallel.mesh import make_mesh
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class MLPBenchResult:
    label: str
    mean_s: float
    rows_per_s: float
    nnz_per_s: float
    frac_roofline: float


def run_mlp_bench(
    depth: int = 4,
    dim: int = 4096,
    batch: int = 256,
    non_zero: int = 10,
    *,
    reps: int = 4,
    mesh_shape: tuple | None = None,
    use_kernel: bool | None = None,
) -> MLPBenchResult:
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    cfg = TernaryMLPConfig(
        layer_dims=(dim,) * (depth + 1), non_zero=non_zero
    )
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    packed = pack_mlp(params)
    x = rng.rand_dense(jax.random.PRNGKey(1), (batch, dim))

    spec = chip_spec()
    # pack_ternary_device leaves nnz unknown (-1); count from the masters
    total_nnz = sum(int(np.count_nonzero(np.asarray(w))) for w in params["w"])
    weight_bytes = sum(w.weight_bytes() for w in packed["w"])
    flops = 2.0 * batch * dim * dim * depth
    bytes_moved = weight_bytes + 2 * depth * batch * dim * 4
    sol = max(
        flops / (spec.bf16_tflops * 1e12),
        bytes_moved / (spec.hbm_gbps * 1e9),
    )

    if mesh_shape is None:
        label = "single-chip"

        def fn(x):
            import jax.numpy as jnp

            return mlp_forward(
                packed, x, cfg, compute_dtype=jnp.bfloat16,
                use_kernel=use_kernel,
            )

        meas = measure_device(fn, x, reps=reps)
    else:
        data, model = mesh_shape
        mesh = make_mesh(data, model)
        sharded = shard_mlp(packed, mesh)
        label = f"mesh {data}x{model}"

        def fn(x):
            import jax.numpy as jnp

            return mlp_forward_sharded(
                sharded, x, cfg, mesh=mesh, compute_dtype=jnp.bfloat16,
                use_kernel=use_kernel,
            )

        meas = measure_device(fn, x, reps=reps)

    t = meas.min_s
    return MLPBenchResult(
        label=label,
        mean_s=t,
        rows_per_s=batch / t,
        nnz_per_s=total_nnz * batch / t,
        frac_roofline=sol / t,
    )


def main(argv=None):
    import argparse

    from smmb_tpu.utils.config import BenchConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--mesh", default=None, help="data x model, e.g. 1x4")
    ap.add_argument(
        "--config", default=None,
        help="BenchConfig JSON (reps used as the measurement protocol)",
    )
    args = ap.parse_args(argv)
    reps = 4
    if args.config:
        with open(args.config) as f:
            reps = BenchConfig.from_json(f.read()).reps
    mesh_shape = (
        tuple(int(v) for v in args.mesh.split("x")) if args.mesh else None
    )
    r = run_mlp_bench(
        args.depth, args.dim, args.batch, mesh_shape=mesh_shape, reps=reps
    )
    print(
        f"{r.label}: depth={args.depth} dim={args.dim} batch={args.batch}  "
        f"t={r.mean_s * 1e6:.1f}us  rows/s={r.rows_per_s:.3e}  "
        f"nnz/s={r.nnz_per_s:.3e}  frac={r.frac_roofline:.2f}"
    )


if __name__ == "__main__":
    main()
