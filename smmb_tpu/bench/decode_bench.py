"""Batch-1 incremental-decode serving benchmark (transformer KV-cache path).

The reference stops at MLP serving; this measures the framework's serving
decode loop — L ternary transformer blocks stepped one token at a time
against static-shape KV caches (models/attention.py:attention_decode_step).
Reports per-step latency and tokens/s, plus the byte-roofline fraction
(per step the chip must stream every packed weight plane once and read the
live KV cache — both HBM-bound at batch 1).

CLI: python -m smmb_tpu decode [--layers 4] [--d-model 1024] [--d-ff 4096]
     [--batch 1] [--max-len 1024] [--cache-dtype bf16]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.bench.roofline import chip_spec
from smmb_tpu.models.transformer import (
    TernaryBlockConfig,
    block_decode_step,
    block_prefill,
    init_block,
    init_block_cache,
    pack_block,
)
from smmb_tpu.utils import rng


# VPU shift-decode cost of a packed 2-bit weight byte on v5e: the decode
# is ~13 vector lane-ops per byte (i8→i32 cast amortized 1/4, two shifts +
# a cast per value) at the VPU's ~3.9e12 lane-ops/s — ≈ 3.4 µs per packed
# MB, the STRUCTURAL floor of every M=1 packed matmul (HBM would allow
# 1.2 µs/MB). Round-5 trace calibration: the fused tail (2.36 MB packed)
# runs 6.97 µs ≈ 0.85 of this model (docs/DESIGN.md "M=1 decode occupancy
# budget"). Decode modes with fewer lane-ops were built and measured
# slower or rejected by Mosaic (kernels/packed_spmm.py docstring).
DECODE_S_PER_BYTE = 13 / 3.85e12


@dataclasses.dataclass(frozen=True)
class DecodeBenchResult:
    step_s: float
    tokens_per_s: float
    frac_roofline: float
    frac_decode_sol: float  # fraction of the VPU-decode-aware floor
    prefill_s: float
    prefill_tokens_per_s: float


def run_decode_bench(
    layers: int = 4,
    d_model: int = 1024,
    n_heads: int = 8,
    d_ff: int = 4096,
    batch: int = 1,
    max_len: int = 1024,
    prompt_len: int = 512,
    *,
    cache_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    reps: int = 4,
    use_kernel: bool | None = None,
    use_flash: bool = False,
) -> DecodeBenchResult:
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    cfg = TernaryBlockConfig(d_model=d_model, n_heads=n_heads, d_ff=d_ff)
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    blocks = [pack_block(init_block(k, cfg), quantize=True) for k in keys]
    caches = [
        init_block_cache(cfg, batch, max_len, dtype=cache_dtype)
        for _ in range(layers)
    ]

    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)

    @jax.jit
    def prefill(x, caches):
        new = []
        for blk, c in zip(blocks, caches):
            x, c = block_prefill(blk, x, c, cfg, **kw)
            new.append(c)
        return x, new

    @jax.jit
    def step(x_t, caches):
        new = []
        for blk, c in zip(blocks, caches):
            x_t, c = block_decode_step(
                blk, x_t, c, cfg, use_flash=use_flash, **kw
            )
            new.append(c)
        return x_t, new

    prompt = rng.rand_dense(jax.random.PRNGKey(1), (batch, prompt_len, d_model))
    caches0 = caches
    y, caches = prefill(prompt, caches)
    jax.block_until_ready(y)

    # close over the empty caches so the PROMPT is the gated loop input —
    # gating only the cache position lets XLA hoist the (loop-invariant)
    # attention compute out of the measurement loop (observed: "prefill"
    # at 27 µs for 512 tokens, 10× under its own compute floor)
    @jax.jit
    def prefill_fn(x):
        return prefill(x, caches0)

    meas_pre = measure_device(prefill_fn, prompt, reps=reps)

    # decode steps are measured the way serving runs them — a lax.scan
    # carrying the caches — and as a slope between two scan lengths.
    # Timing a bare step(x, caches) call instead measures full cache
    # copies every call (non-donated inputs can't be updated in place),
    # which is the harness's artifact, not the serving cost.
    x_t = rng.rand_dense(jax.random.PRNGKey(2), (batch, 1, d_model))

    def steps_fn(n):
        @jax.jit
        def run(x_t, caches):
            def body(carry, _):
                x_t, caches = carry
                y, caches = step(x_t, caches)
                # value-dependence: next step's input follows this one
                return ((x_t + y * 1e-6).astype(x_t.dtype), caches), ()

            (xf, _), _ = jax.lax.scan(body, (x_t, caches), None, length=n)
            return xf

        return run

    n0 = 16
    lo = measure_device(steps_fn(n0), x_t, caches, reps=reps).min_s
    hi = measure_device(steps_fn(3 * n0), x_t, caches, reps=reps).min_s
    step_s = max((hi - lo) / (2 * n0), 1e-9)

    # byte roofline per decode step: all packed planes once + the LIVE
    # KV prefix (a perfect step reads only pos+1 cached tokens — the
    # flash-decode kernel's cost model; the jnp path reads the whole
    # static max_len buffer and is judged against the same honest floor)
    wbytes = layers * (
        4 * d_model * d_model + 2 * d_model * d_ff
    ) // 4  # 2-bit planes
    kv_bytes = (
        layers * 2 * batch * (prompt_len + 1) * d_model
        * jnp.dtype(cache_dtype).itemsize
    )
    spec = chip_spec()
    sol = (wbytes + kv_bytes) / (spec.hbm_gbps * 1e9)
    # VPU-decode-aware speed of light: weight planes are bound by the
    # in-kernel 2-bit decode (DECODE_S_PER_BYTE), the cache read by HBM —
    # the honest per-step floor at M=1 (frac_roofline's byte-only floor
    # under-reads the kernels by the decode multiplier; VERDICT r4 #3)
    sol_dec = (
        max(wbytes / (spec.hbm_gbps * 1e9), wbytes * DECODE_S_PER_BYTE)
        + kv_bytes / (spec.hbm_gbps * 1e9)
    )
    return DecodeBenchResult(
        step_s=step_s,
        tokens_per_s=batch / step_s,
        frac_roofline=sol / step_s,
        frac_decode_sol=sol_dec / step_s,
        prefill_s=meas_pre.min_s,
        prefill_tokens_per_s=batch * prompt_len / meas_pre.min_s,
    )


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--n-heads", type=int, default=8)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--cache-dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--flash", action="store_true",
                    help="decode attention via the flash-decode kernel")
    args = ap.parse_args(argv)
    r = run_decode_bench(
        args.layers, args.d_model, args.n_heads, args.d_ff, args.batch,
        args.max_len, args.prompt_len,
        cache_dtype=jnp.bfloat16 if args.cache_dtype == "bf16" else jnp.float32,
        reps=args.reps, use_flash=args.flash,
    )
    print(
        f"decode: layers={args.layers} d={args.d_model} ff={args.d_ff} "
        f"batch={args.batch} ctx={args.prompt_len}/{args.max_len}  "
        f"step={r.step_s * 1e6:.1f}us  tok/s={r.tokens_per_s:.0f}  "
        f"frac={r.frac_roofline:.2f}  frac_decode_sol={r.frac_decode_sol:.2f}  "
        f"prefill={r.prefill_s * 1e6:.1f}us ({r.prefill_tokens_per_s / 1e6:.2f}M tok/s)"
    )


if __name__ == "__main__":
    main()
