#!/usr/bin/env python
"""Example: mesh-sharded serving of a packed ternary MLP.

Runs on the virtual CPU mesh (8 devices) so it works anywhere:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_serving.py --cpu

On a real pod slice, drop --cpu and call
``smmb_tpu.parallel.multihost.initialize_multihost()`` first on every host.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smmb_tpu.models.mlp import (
    TernaryMLPConfig,
    init_mlp,
    mlp_forward,
    mlp_forward_sharded,
    pack_mlp,
    shard_mlp,
)
from smmb_tpu.parallel import make_mesh, sharded_spmm_column_overlapped
from smmb_tpu.parallel.sharded import shard_packed_columns
from smmb_tpu.utils import rng


def main():
    n_dev = len(jax.devices())
    data = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(data, n_dev // data)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} {jax.default_backend()} devices")

    use_kernel = jax.default_backend() == "tpu"
    cfg = TernaryMLPConfig(layer_dims=(2048, 4096, 2048, 2048))
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    packed = pack_mlp(params)
    x = rng.rand_dense(jax.random.PRNGKey(1), (16 * data, 2048))

    # single-device reference
    ref = mlp_forward(packed, x, cfg, use_kernel=use_kernel)

    # Megatron-paired sharded forward: col -> row(psum) -> col
    sharded = shard_mlp(packed, mesh)
    y = mlp_forward_sharded(sharded, x, cfg, mesh=mesh, use_kernel=use_kernel)
    err = float(np.abs(np.asarray(y) - np.asarray(ref)).max())
    print(f"sharded MLP == single device: max abs err {err:.2e}")

    # ring-overlapped collective matmul on a feature-sharded input
    w0 = shard_packed_columns(packed["w"][0], mesh)
    y0 = sharded_spmm_column_overlapped(
        x, w0, packed["b"][0], mesh=mesh, alpha=cfg.alpha,
        use_kernel=use_kernel,
    )
    print(f"overlapped column layer output: {y0.shape}, "
          f"sharding {y0.sharding}")


if __name__ == "__main__":
    main()
