"""Device mesh construction for the multi-chip partitioner.

The reference has no distributed layer at all (SURVEY.md §2 checklist — its
only parallelism is an OpenMP row loop, /root/reference/SparseGEMM.h:106).
This layer is net-new, specified by BASELINE.json's north star: weight
column/block partitioning over a pod-slice mesh with activations exchanged
via XLA collectives.

Axis convention used throughout the framework:
    "data"  — batch (M) sharding; the TPU analog of the OpenMP row split
    "model" — feature sharding of the ternary weight planes (N or K axis)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1, model: int | None = None, devices=None
) -> Mesh:
    """Build a (data × model) mesh over the available devices.

    ``model=None`` uses all remaining devices on the model axis. On a real
    pod slice, mesh_utils picks an ICI-contiguous layout so the model-axis
    collectives (the hot ones) ride ICI, not DCN.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model != n:
        devices = devices[: data * model]
    dev_array = mesh_utils.create_device_mesh(
        (data, model), devices=np.asarray(devices)
    )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])
