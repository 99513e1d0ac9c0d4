"""Test session config: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; all sharding tests run on a
virtual 8-device CPU mesh (SURVEY.md §4's "multi-host parity tests runnable
on CPU" requirement). Pallas kernels run in interpreter mode on CPU — the
kernels auto-detect the backend (smmb_tpu/kernels/_compat.py).

NOTE: this environment's sitecustomize registers a remote "axon" TPU plugin
and pins ``jax_platforms`` — plain JAX_PLATFORMS=cpu env is overridden, so we
force CPU via jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
