"""Offline block-size autotuner for the packed SpMM kernel.

The v5e tile-size landscape is spiky (docs/RESULTS.md): 512→2048 K-tiles is
a 15% headline win, while some configs (full-K tiles, 1024×2048) hit
pathological multi-minute compiles. Defaults in the kernel encode the
measured heuristic; this utility re-derives the best config for a specific
(M, K, N, dtype) on the current chip and caches it in a JSON file so serving
deployments can pin tuned tiles.

    from smmb_tpu.bench.autotune import autotune_packed_spmm
    cfg = autotune_packed_spmm(256, 4096, 4096)   # {'block_m':..,...}
    y = packed_spmm(x, w, b, **cfg)

CLI: python -m smmb_tpu.bench.autotune M K N [--dtype bf16]
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.packed import GROUP_ROWS, pack_ternary
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.utils import rng

CACHE_PATH = os.environ.get(
    "SMMB_AUTOTUNE_CACHE", os.path.expanduser("~/.smmb_tpu_autotune.json")
)

# candidate tiles; configs known to hit pathological Mosaic compiles on
# v5e (full-K 4096 tiles, 1024x2048) are excluded
_CANDIDATES = [
    {"block_m": 256, "block_n": 512, "block_k": 512},
    {"block_m": 256, "block_n": 512, "block_k": 1024},
    {"block_m": 256, "block_n": 512, "block_k": 2048},
    {"block_m": 256, "block_n": 1024, "block_k": 512},
    {"block_m": 256, "block_n": 1024, "block_k": 1024},
    {"block_m": 128, "block_n": 512, "block_k": 2048},
    # wide-N shallow-K regime (round-3 find: 50.2us headline vs 55.6 for
    # bn512/bk2048 — scripts/probe_r3_tiles.py 2026-08-19); bn4096 OOMs
    # VMEM for f32 compute, the kernel's heuristic gates it to bf16
    {"block_m": 256, "block_n": 2048, "block_k": 512},
    {"block_m": 256, "block_n": 2048, "block_k": 1024},
    {"block_m": 256, "block_n": 4096, "block_k": 512},
]

# int8 (W2A8) serving mode: the int8 MXU halves matmul time, so the decode
# can become the bottleneck — the fold decode's per-plane int32
# accumulators halve decode lane-ops (v5e probe 2026-08-17: shift 50.7us /
# fold 51.5us at 256x4096x4096 — within noise; keep both as candidates)
_CANDIDATES_INT8_EXTRA = [
    {"block_m": 256, "block_n": 512, "block_k": 2048, "decode": "fold"},
    {"block_m": 256, "block_n": 1024, "block_k": 1024, "decode": "fold"},
]

# weight-streaming regime (M <= 32): large N/K tiles minimize grid steps
# per byte of weight traffic
_CANDIDATES_SMALL_M = [
    {"block_m": 8, "block_n": 1024, "block_k": 1024},
    {"block_m": 8, "block_n": 2048, "block_k": 1024},
    {"block_m": 8, "block_n": 2048, "block_k": 512},
    {"block_m": 8, "block_n": 512, "block_k": 2048},
]


def default_candidates(m: int, dtype) -> list:
    cands = list(_CANDIDATES_SMALL_M if m <= 32 else _CANDIDATES)
    if jnp.dtype(dtype) == jnp.int8:
        cands += _CANDIDATES_INT8_EXTRA
    return cands


def _key(m, k, n, dtype):
    dev = jax.devices()[0].device_kind.replace(" ", "_")
    return f"{dev}|{m}x{k}x{n}|{jnp.dtype(dtype).name}"


def _load_cache() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def autotune_packed_spmm(
    m: int,
    k: int,
    n: int,
    dtype=jnp.bfloat16,
    *,
    candidates=None,
    non_zero: int = 10,
    reps: int = 3,
    use_cache: bool = True,
    verbose: bool = False,
) -> dict:
    """Measure the candidate tile configs, return the fastest, cache it."""
    key = _key(m, k, n, dtype)
    cache = _load_cache()
    if use_cache and key in cache:
        return cache[key]["config"]

    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = rng.rand_dense(kx, (m, k))
    p = pack_ternary(np.asarray(rng.rand_ternary(kw, (k, n), non_zero)))
    best, best_t = None, float("inf")
    for cand in candidates or default_candidates(m, dtype):
        if cand["block_k"] % GROUP_ROWS:
            continue

        def f(x, d):
            from smmb_tpu.formats.packed import TernaryPacked

            w_ = TernaryPacked(data=d, rows=k, cols=n, nnz=-1)
            return packed_spmm(x, w_, compute_dtype=dtype, **cand)

        try:
            meas = measure_device(f, x, p.data, reps=reps)
        except Exception as e:  # config failed to compile — skip it
            if verbose:
                print(f"  {cand}: FAILED {type(e).__name__}")
            continue
        if verbose:
            print(f"  {cand}: {meas.min_s * 1e6:.1f}us")
        if meas.min_s < best_t:
            best, best_t = cand, meas.min_s

    if best is None:
        raise RuntimeError("no candidate config compiled")
    cache[key] = {"config": best, "time_us": best_t * 1e6}
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=2)
    except OSError:
        pass
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("m", type=int)
    ap.add_argument("k", type=int)
    ap.add_argument("n", type=int)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32", "int8"])
    args = ap.parse_args()
    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32, "int8": jnp.int8}[
        args.dtype
    ]
    cfg = autotune_packed_spmm(
        args.m, args.k, args.n, dt, use_cache=False, verbose=True
    )
    print(json.dumps(cfg))


if __name__ == "__main__":
    main()
