"""Multi-host orchestration (net-new; BASELINE.md "N≥2 hosts" point).

The reference is strictly single-process (SURVEY.md §2 checklist). On TPU
pods, multi-host SPMD needs one ``jax.distributed.initialize`` per host
before any device use; afterwards every host sees the global device list and
the same ``shard_map`` programs from smmb_tpu.parallel.sharded run unchanged
over the pod-wide mesh (data/model axes laid out ICI-first by
``mesh_utils.create_device_mesh``).

Single-chip CI cannot exercise this path; it is validated structurally by
the virtual-device tests (tests/test_parallel.py) and kept deliberately
thin — all real logic lives in mesh/sharded modules that are backend-count
agnostic.
"""

from __future__ import annotations

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize JAX distributed for a multi-host pod slice.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere. Returns a summary dict for logging.
    No-op when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate ONLY re-initialization; anything else (bad coordinator,
        # connection failure) must surface — a swallowed error here would
        # silently fall back to single-process and report process_count=1
        if "already initialized" not in str(e).lower():
            raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the host that should write artifacts/logs."""
    return jax.process_index() == 0
