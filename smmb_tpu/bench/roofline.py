"""Per-chip roofline model: peak HBM bandwidth and MXU FLOP/s by TPU gen.

Replaces the reference's hardcoded plot cap ("peak = 1.0 flops/cycle",
/root/reference/performance.py:48-51) with a real two-ceiling roofline.
BASELINE.md's target is stated against this model: TCSC SpMM ≥80% of the
memory-bandwidth roofline in nnz/s.

Numbers are the public per-chip specs (Google Cloud TPU docs); unknown
platforms fall back to a CPU entry so the model stays runnable in CI.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    bf16_tflops: float  # peak MXU bf16 FLOP/s, T
    fp32_tflops: float  # effective fp32 matmul peak, T
    hbm_gib: float  # capacity


_SPECS = {
    "v4": ChipSpec("TPU v4", 1228.0, 275.0, 68.75, 32.0),
    "v5e": ChipSpec("TPU v5e", 819.0, 197.0, 49.25, 16.0),
    "v5p": ChipSpec("TPU v5p", 2765.0, 459.0, 114.75, 95.0),
    "v6e": ChipSpec("TPU v6e", 1640.0, 918.0, 229.5, 32.0),
    # CPU fallback keeps the harness runnable on the 8-device test mesh
    "cpu": ChipSpec("host CPU (fallback)", 50.0, 1.0, 0.5, 64.0),
}


def chip_spec(device=None) -> ChipSpec:
    """Best-effort spec lookup for the current (or given) jax device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    plat = getattr(device, "platform", "").lower()
    if plat != "tpu" and "tpu" not in kind:
        return _SPECS["cpu"]
    norm = kind.replace(" ", "").replace("lite", "e")  # "v5 lite" → v5e
    for tag, spec in _SPECS.items():
        if tag in norm:
            return spec
    return _SPECS["v5e"]  # conservative default for unknown TPU kinds


def roofline_time_s(
    flops: float,
    bytes_moved: float,
    spec: ChipSpec | None = None,
    dtype: str = "bf16",
) -> float:
    """Speed-of-light seconds: max(compute ceiling, bandwidth ceiling)."""
    spec = spec or chip_spec()
    peak_flops = (
        spec.bf16_tflops if dtype == "bf16" else spec.fp32_tflops
    ) * 1e12
    return max(flops / peak_flops, bytes_moved / (spec.hbm_gbps * 1e9))
