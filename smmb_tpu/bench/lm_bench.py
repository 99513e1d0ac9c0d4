"""End-to-end LM generation benchmark (models/lm.generate).

Times the complete serving loop — embeddings, N packed transformer blocks
with KV caches, RMSNorm, packed LM head, greedy token selection — as the
single jitted program a server would run, and reports device-side
µs/token from the slope between two step counts (cancels dispatch latency
and the prefill, which matters behind this environment's ~28 ms tunnel).

CLI: python -m smmb_tpu lm [--layers 4] [--d-model 1024] [--d-ff 4096]
     [--vocab 8192] [--batch 1] [--prompt-len 32] [--steps 64]
     [--kv-heads N] [--temperature T]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm
from smmb_tpu.utils import rng  # noqa: F401  (re-exported bench convention)


@dataclasses.dataclass(frozen=True)
class LMBenchResult:
    per_token_s: float
    tokens_per_s: float
    lo_s: float
    hi_s: float


def run_lm_bench(
    cfg: TernaryLMConfig,
    batch: int = 1,
    prompt_len: int = 32,
    steps: int = 64,
    temperature: float = 0.0,
    reps: int = 3,
    seed: int = 0,
    kv_quant: bool = False,
    use_flash: bool = False,
) -> LMBenchResult:
    """Per-token decode cost from calibrated device loops at two step
    counts: slope = (t(3·steps) − t(steps)) / (2·steps), cancelling the
    prefill and any fixed per-call overhead. Naive walltime is NOT used —
    on a remote-dispatch device it under-measures wildly."""
    params = init_lm(jax.random.PRNGKey(seed), cfg)
    packed = pack_lm(params)
    toks = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (batch, prompt_len), 0, cfg.vocab
    )
    kw = dict(
        compute_dtype=jnp.bfloat16, temperature=temperature,
        kv_quant=kv_quant, use_flash=use_flash,
    )
    if temperature > 0:
        kw["key"] = jax.random.PRNGKey(seed + 2)

    def timed(n_steps):
        def fn(packed, toks):
            return generate(packed, toks, cfg, n_steps, **kw)

        return measure_device(fn, packed, toks, reps=reps).min_s

    lo, hi = timed(steps), timed(steps * 3)
    per_tok = (hi - lo) / (2 * steps)
    return LMBenchResult(per_tok, 1.0 / per_tok, lo, hi)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--n-heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=None)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache (4x less decode read traffic)")
    ap.add_argument("--flash", action="store_true",
                    help="flash-attention prefill")
    ap.add_argument("--rope", action="store_true")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--experts", type=int, default=None,
                    help="MoE LM: routed-FFN blocks with this many experts")
    ap.add_argument("--top-k", type=int, default=1)
    args = ap.parse_args(argv)
    cfg = TernaryLMConfig(
        vocab=args.vocab, d_model=args.d_model, n_heads=args.n_heads,
        d_ff=args.d_ff, n_layers=args.layers,
        max_len=args.prompt_len + 3 * args.steps,
        n_kv_heads=args.kv_heads, rope=args.rope, window=args.window,
        n_experts=args.experts, top_k=args.top_k,
    )
    r = run_lm_bench(
        cfg, args.batch, args.prompt_len, args.steps,
        temperature=args.temperature, reps=args.reps,
        kv_quant=args.kv_quant, use_flash=args.flash,
    )
    print(
        f"lm-generate: layers={args.layers} d={args.d_model} ff={args.d_ff} "
        f"vocab={args.vocab} batch={args.batch} kv={cfg.block.attn.kv_heads}"
        f"{' kvq' if args.kv_quant else ''}{' flash' if args.flash else ''}"
        f"{' rope' if args.rope else ''}"
        f"{f' win{args.window}' if args.window else ''}"
        f"{f' moe{args.experts}x{args.top_k}' if args.experts else ''}"
        f"  {r.per_token_s * 1e6:.1f}us/tok = {r.tokens_per_s:.0f} tok/s "
        f"(slope {args.steps}->{3 * args.steps} steps; "
        f"lo={r.lo_s * 1e3:.2f}ms hi={r.hi_s * 1e3:.2f}ms)"
    )


if __name__ == "__main__":
    main()
