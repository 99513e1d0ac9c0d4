"""End-to-end speculative-decoding win demonstration (VERDICT r2 #6).

Round-2's spec bench used a RANDOM-INIT target, where speculation cannot
pay by construction (measured, scripts/probe_spec.py 2026-08-19):

  * verify cost ~= one plain decode step (both weight-streaming-bound), so
    a same-size draft is >= (k+2)/(k+1) of plain even at full acceptance;
  * a random model's logits are near-ties, so even SELF-drafting only
    accepts ~2.8/4 proposals in bf16 — the step-decode and chunk-verify
    paths batch their matmuls differently and flip the argmax.

The realistic configuration is a PEAKED (trained) target + a small
distilled draft. This script builds exactly that, on-chip:

  1. STE-train the target briefly on a synthetic Zipf-ish corpus with
     learnable structure (models/lm.make_lm_train_step);
  2. distill the small draft against the packed target
     (models/spec_decode.make_draft_distill_step);
  3. measure plain vs speculative us/token (device slope) + acceptance.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_spec_win.py
"""

import time

T0 = time.time()

# provenance stamp: first output line records the commit being measured
# (round-3 VERDICT #1 — artifacts must match the code at HEAD)
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from smmb_tpu.utils.stamp import print_stamp
print_stamp()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import functools

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    make_lm_train_step,
    pack_lm,
)
from smmb_tpu.models.spec_decode import (
    generate_speculative,
    make_draft_distill_step,
)


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


K_SPEC = 4
STEPS = 64
PROMPT = 32
VOCAB = 8192
MAX_LEN = PROMPT + 3 * STEPS + K_SPEC + 1
TCFG = TernaryLMConfig(
    vocab=VOCAB, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
    max_len=MAX_LEN,
)
DCFG = TernaryLMConfig(
    vocab=VOCAB, d_model=256, n_heads=2, d_ff=1024, n_layers=1,
    max_len=MAX_LEN,
)
KW = dict(compute_dtype=jnp.bfloat16, use_kernel=True)


_SUCC = jax.random.randint(jax.random.PRNGKey(777), (VOCAB,), 0, VOCAB)


def synth_batch(key, batch, seqlen, noise_p=0.05):
    """Synthetic corpus with LEARNABLE structure: a fixed random bigram
    successor table + noise. A model trained on it sharpens its logits —
    which is the property that makes speculation pay (peaked logits =>
    draft/target argmax agreement). ``key`` varies per call so every
    training step sees fresh walks over the same table."""
    ks, kn, kr = jax.random.split(key, 3)
    first = jax.random.randint(ks, (batch, 1), 0, VOCAB)

    def step(tok, inp):
        noise, rnd = inp
        nxt = jnp.where(noise, rnd, _SUCC[tok])
        return nxt, nxt

    noise = jax.random.bernoulli(kn, noise_p, (seqlen - 1, batch, 1))
    rnd = jax.random.randint(kr, (seqlen - 1, batch, 1), 0, VOCAB)
    _, rest = jax.lax.scan(step, first, (noise, rnd))
    return jnp.concatenate([first[None], rest]).squeeze(-1).T  # (B, T)


def main():
    t(f"devices: {jax.devices()}")

    # --- 1) train the target (STE) until its logits peak ---
    params = init_lm(jax.random.PRNGKey(0), TCFG)
    init_opt, train_step = make_lm_train_step(TCFG, learning_rate=2e-3)
    train_step = jax.jit(train_step)
    opt = init_opt(params)
    batch_key = jax.random.PRNGKey(7)
    for i in range(400):
        batch_key, k = jax.random.split(batch_key)
        toks = synth_batch(k, 32, 128)
        params, opt, loss = train_step(params, opt, toks)
        if i % 100 == 0 or i == 399:
            t(f"target train step {i}: loss {float(loss):.3f}")
    target = pack_lm(params, quantize=True)

    # --- 2) distill the draft against the packed target ---
    dparams = init_lm(jax.random.PRNGKey(1), DCFG)
    dinit, dstep = make_draft_distill_step(
        target, TCFG, DCFG, learning_rate=2e-3
    )
    dstep = jax.jit(dstep)
    dopt = dinit(dparams)
    for i in range(400):
        batch_key, k = jax.random.split(batch_key)
        toks = synth_batch(k, 32, 128)
        dparams, dopt, dloss = dstep(dparams, dopt, toks)
        if i % 100 == 0 or i == 399:
            t(f"draft distill step {i}: loss {float(dloss):.3f}")
    draft = pack_lm(dparams, quantize=True)

    prompt = synth_batch(jax.random.PRNGKey(99), 1, PROMPT, noise_p=0.0)

    # --- draft/target argmax agreement on generated continuations
    g_plain = np.asarray(generate(target, prompt, TCFG, STEPS, **KW))
    g_spec = np.asarray(
        generate_speculative(
            target, draft, prompt, TCFG, DCFG, STEPS, k=K_SPEC, **KW
        )
    )
    agree = float((g_plain == g_spec).mean())
    t(f"spec == plain tokens: {bool((g_plain == g_spec).all())} "
      f"(agreement {agree:.2f}; first 12: {g_spec[0, :12].tolist()})")
    # how peaked did training get: does the target follow the bigram table
    follows = float((g_plain[0, 1:] == np.asarray(_SUCC)[g_plain[0, :-1]])
                    .mean())
    t(f"target follows bigram successor: {follows:.2f} of steps")

    # --- 3) device-slope timing ---
    def slope(fn_for_steps):
        lo = measure_device(*fn_for_steps(STEPS), reps=3).min_s
        hi = measure_device(*fn_for_steps(3 * STEPS), reps=3).min_s
        return (hi - lo) / (2 * STEPS) * 1e6

    def plain_at(steps):
        f = lambda tg, p: generate(tg, p, TCFG, steps, **KW)
        return (f, target, prompt)

    def spec_at(steps):
        f = lambda tg, dr, p: generate_speculative(
            tg, dr, p, TCFG, DCFG, steps, k=K_SPEC, **KW
        )
        return (f, target, draft, prompt)

    p_us = slope(plain_at)
    t(f"plain generate:        {p_us:8.1f} us/tok")
    s_us = slope(spec_at)
    t(f"spec (distilled draft): {s_us:7.1f} us/tok "
      f"({p_us / s_us:.2f}x vs plain)")
    t("DONE")


if __name__ == "__main__":
    main()
