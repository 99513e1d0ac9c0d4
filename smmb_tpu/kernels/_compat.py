"""Backend detection shared by all Pallas kernels.

Kernels compile natively on TPU and fall back to interpreter mode elsewhere
(CPU test meshes, SURVEY.md §4's CPU-simulated CI requirement).
"""

from __future__ import annotations

import jax


def use_interpret(interpret: bool | None) -> bool:
    """Resolve the ``interpret`` kwarg: explicit value wins, else interpret
    everywhere except real TPU backends."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"
