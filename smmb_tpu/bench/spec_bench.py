"""Speculative-decoding benchmark (models/spec_decode.generate_speculative).

Reports device-side µs/token (slope between two step counts, like
bench/lm_bench.py) for three serving configurations of the SAME target:

* plain     — models/lm.generate, the autoregressive baseline;
* spec-self — draft == target. NOT full acceptance on a random-init
  model (measured on-chip, scripts/probe_spec.py 2026-08-19): the draft's
  step-by-step decode and the verify's (k+1)-row chunk batch their
  matmuls differently, and on near-tie random logits the argmax flips —
  self-drafting accepted only ~2.8/4 in bf16. One spec round costs
  exactly its parts (5 draft steps + 1 verify ≈ 507 µs measured vs
  564 µs summed), so the machinery adds no plumbing overhead; the
  economics are acceptance × draft cost. With verify ≈ one plain step
  (both weight-streaming-bound at batch ≤ k+1), a same-size draft can
  never pay — this row is a diagnostic, not an upper bound;
* spec-draft — an independently-initialized small draft. For RANDOM
  models acceptance is ~1/vocab (worst case), so this bounds the cost of
  full rejection. The configuration where speculation WINS — a briefly
  trained (peaked) target + distilled small draft — is measured by
  scripts/bench_spec_win.py.

CLI: python -m smmb_tpu spec [--layers 4] [--d-model 1024] [--d-ff 4096]
     [--vocab 8192] [--draft-layers 1] [--draft-d-model 256]
     [--prompt-len 32] [--steps 64] [--k 4]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.models.lm import TernaryLMConfig, generate, init_lm, pack_lm
from smmb_tpu.models.spec_decode import generate_speculative


def _slope(fn_for_steps, steps, reps):
    lo = measure_device(*fn_for_steps(steps), reps=reps).min_s
    hi = measure_device(*fn_for_steps(steps * 3), reps=reps).min_s
    return (hi - lo) / (2 * steps)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--n-heads", type=int, default=8)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--draft-layers", type=int, default=1)
    ap.add_argument("--draft-d-model", type=int, default=256)
    ap.add_argument("--draft-d-ff", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    max_len = args.prompt_len + 3 * args.steps + args.k + 1
    tcfg = TernaryLMConfig(
        vocab=args.vocab, d_model=args.d_model, n_heads=args.n_heads,
        d_ff=args.d_ff, n_layers=args.layers, max_len=max_len,
    )
    dcfg = TernaryLMConfig(
        vocab=args.vocab, d_model=args.draft_d_model,
        n_heads=max(1, args.n_heads // 4), d_ff=args.draft_d_ff,
        n_layers=args.draft_layers, max_len=max_len,
    )
    target = pack_lm(init_lm(jax.random.PRNGKey(0), tcfg))
    draft = pack_lm(init_lm(jax.random.PRNGKey(1), dcfg))
    prompt = jax.random.randint(
        jax.random.PRNGKey(2), (1, args.prompt_len), 0, tcfg.vocab
    )
    kw = dict(compute_dtype=jnp.bfloat16)

    def plain(steps):
        def fn(t, p):
            return generate(t, p, tcfg, steps, **kw)

        return (fn, target, prompt)

    def spec(d, d_cfg):
        def make(steps):
            def fn(t, dr, p):
                return generate_speculative(
                    t, dr, p, tcfg, d_cfg, steps, k=args.k, **kw
                )

            return (fn, target, d, prompt)

        return make

    base = _slope(plain, args.steps, args.reps)
    print(f"plain      generate: {base * 1e6:8.1f} us/tok", flush=True)
    self_s = _slope(spec(target, tcfg), args.steps, args.reps)
    print(
        f"spec-self  (k={args.k}): {self_s * 1e6:8.1f} us/tok "
        f"({base / self_s:.2f}x vs plain; full acceptance)",
        flush=True,
    )
    rand_s = _slope(spec(draft, dcfg), args.steps, args.reps)
    print(
        f"spec-draft (k={args.k}): {rand_s * 1e6:8.1f} us/tok "
        f"({base / rand_s:.2f}x vs plain; random draft ~ full rejection)",
        flush=True,
    )


if __name__ == "__main__":
    main()
