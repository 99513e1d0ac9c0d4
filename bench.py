#!/usr/bin/env python
"""Headline benchmark: TCSC SpMM fraction-of-roofline per chip.

BASELINE.json config 1: 4096×4096 ternary weights @ ~10% nnz × dense batch-256
activations, executed through the framework's serving path (2-bit packed
planes → Pallas decompress-and-MXU kernel, bf16 compute / f32 accumulate).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value = achieved fraction of the two-ceiling roofline (MXU bf16 peak vs
HBM bandwidth, smmb_tpu/bench/roofline.py) and vs_baseline normalizes by the
0.80 target from BASELINE.md. Timing uses the dispatch-latency-cancelling
device loop (smmb_tpu/bench/measure.py:measure_device).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench import (
    chip_spec,
    measure_device,
    sparse_flops,
    spmm_bytes,
)
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.utils import rng

M, K, N = 256, 4096, 4096
NON_ZERO = 10  # expected density 1/10 (BASELINE.json: "~10% nnz")
TARGET_FRAC = 0.80  # BASELINE.md per-chip roofline target


def main():
    from smmb_tpu.utils.cache import enable_compile_cache
    from smmb_tpu.utils.stamp import stamp

    # provenance on stderr — stdout stays the single JSON line
    print(stamp(), file=sys.stderr, flush=True)
    enable_compile_cache()
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = rng.rand_dense(kx, (M, K))
    w = rng.rand_ternary(kw, (K, N), non_zero=NON_ZERO)
    b = rng.rand_dense(kb, (N,))
    p = pack_ternary(np.asarray(w))

    on_tpu = jax.default_backend() == "tpu"

    def run(x, data, b):
        from smmb_tpu.formats.packed import TernaryPacked

        w_ = TernaryPacked(data=data, rows=K, cols=N, nnz=p.nnz)
        if on_tpu:
            return packed_spmm(x, w_, b, compute_dtype=jnp.bfloat16)
        return packed_spmm_jnp(x, w_, b, dtype=jnp.float32)

    meas = measure_device(run, x, p.data, b, iters=4096, reps=8)

    spec = chip_spec()
    flops = 2.0 * M * N * K  # MXU executes the dense product post-decode
    bytes_moved = spmm_bytes(M, N, K, weight_bytes=p.weight_bytes())
    sol = max(
        flops / (spec.bf16_tflops * 1e12),
        bytes_moved / (spec.hbm_gbps * 1e9),
    )
    # the device may be time-shared: min_s is the quiet-window capability
    # (see measure_device); mean_s tracks the contended median
    t_best = meas.min_s
    frac = sol / t_best
    nnz_per_s = p.nnz * M / t_best
    eff_flops = sparse_flops(M, N, p.nnz) / t_best

    result = {
        "metric": "tcsc_spmm_frac_roofline",
        "value": round(frac, 4),
        "unit": f"fraction of {spec.name} roofline "
        f"(best {t_best * 1e6:.1f}us, median {meas.mean_s * 1e6:.1f}us, "
        f"{nnz_per_s / 1e9:.1f}Gnnz/s, "
        f"{eff_flops / 1e12:.2f}T eff FLOP/s, M={M} K={K} N={N} d={p.density:.2f})",
        "vs_baseline": round(frac / TARGET_FRAC, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
