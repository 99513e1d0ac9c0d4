"""Persistent XLA compilation cache helper.

TPU compiles in this dev environment go through a remote tunnel at 40s-6min
each; the persistent cache turns every re-run into a warm start. Called by
the benchmark entry points (not on package import — mutating global jax
config belongs to applications, not library import side effects).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get("SMMB_COMPILE_CACHE", "/root/.jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
