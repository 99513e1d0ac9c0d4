"""End-to-end speculative-decoding win on REAL TEXT, lossless (VERDICT r3 #3).

Round 3 demonstrated a 1.3× spec win but (a) on a degenerate synthetic
bigram corpus whose easy drafting inflated acceptance, and (b) with
`spec == plain tokens: False` on-chip — the einsum verify path and the
flash step path argmax-diverged on bf16 near-ties.

This round fixes both:

  * corpus: BYTE-LEVEL English/markdown text from this repo's own docs
    (README.md + docs/ + SURVEY.md, ~100+ KB, committed = reproducible) —
    natural-language structure, not a lookup table;
  * losslessness: use_flash=True routes the verify chunk through the
    flash-chunk kernel — the SAME kernel/accumulation as the flash decode
    step, so verify logits are bitwise identical per row to the step path
    (kernels/flash_decode._flash_cache_attention) and greedy spec output
    must equal plain greedy generate. The script HARD-FAILS if it doesn't,
    and refuses to publish timing (reference invariant main.cpp:317-320).

  1. STE-train the byte target on text windows;
  2. distill the small draft against the packed target;
  3. assert spec == plain on a held-out prompt (gate);
  4. measure plain vs spec us/token (device slope) + measured acceptance.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_spec_win.py
"""

import time

T0 = time.time()

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

import glob

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
PROMPT = 64
VOCAB = 256  # byte-level
MAX_LEN = PROMPT + 3 * STEPS + K_SPEC + 1
TCFG = TernaryLMConfig(
    vocab=VOCAB, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
    max_len=MAX_LEN,
)
DCFG = TernaryLMConfig(
    vocab=VOCAB, d_model=256, n_heads=2, d_ff=1024, n_layers=1,
    max_len=MAX_LEN,
)
KW = dict(compute_dtype=jnp.bfloat16, use_kernel=True, use_flash=True)


def load_corpus():
    """Real text: this repo's committed prose, byte-level."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = (
        [os.path.join(root, "README.md"), os.path.join(root, "SURVEY.md")]
        + sorted(glob.glob(os.path.join(root, "docs", "*.md")))
    )
    text = "\n\n".join(open(f, errors="replace").read() for f in files)
    data = np.frombuffer(text.encode("utf-8", "replace"), np.uint8)
    split = int(len(data) * 0.9)
    return data[:split], data[split:]  # train, held-out


TRAIN, HELD = load_corpus()


def text_batch(key, batch, seqlen):
    """Random windows over the training text."""
    starts = jax.random.randint(key, (batch,), 0, len(TRAIN) - seqlen - 1)
    idx = np.asarray(starts)[:, None] + np.arange(seqlen)[None, :]
    return jnp.asarray(TRAIN[idx], jnp.int32)


def main():
    t(f"devices: {jax.devices()}")
    t(f"corpus: {len(TRAIN)} train bytes, {len(HELD)} held-out bytes")

    # --- 1) train the byte-level target (STE) ---
    params = init_lm(jax.random.PRNGKey(0), TCFG)
    init_opt, train_step = make_lm_train_step(TCFG, learning_rate=2e-3)
    train_step = jax.jit(train_step)
    opt = init_opt(params)
    batch_key = jax.random.PRNGKey(7)
    for i in range(600):
        batch_key, k = jax.random.split(batch_key)
        toks = text_batch(k, 32, 128)
        params, opt, loss = train_step(params, opt, toks)
        if i % 150 == 0 or i == 599:
            t(f"target train step {i}: loss {float(loss):.3f} "
              f"({float(loss) / np.log(2):.2f} bits/byte)")
    target = pack_lm(params, quantize=True)

    # --- 2) distill the draft against the packed target ---
    dparams = init_lm(jax.random.PRNGKey(1), DCFG)
    dinit, dstep = make_draft_distill_step(
        target, TCFG, DCFG, learning_rate=2e-3
    )
    dstep = jax.jit(dstep)
    dopt = dinit(dparams)
    for i in range(500):
        batch_key, k = jax.random.split(batch_key)
        toks = text_batch(k, 32, 128)
        dparams, dopt, dloss = dstep(dparams, dopt, toks)
        if i % 125 == 0 or i == 499:
            t(f"draft distill step {i}: loss {float(dloss):.3f}")
    draft = pack_lm(dparams, quantize=True)

    # held-out prompt: real unseen text
    prompt = jnp.asarray(HELD[:PROMPT], jnp.int32)[None]

    # --- 3+4) per-k: losslessness gate, then device-slope timing.
    # k is the draft depth; with per-token acceptance well below 1 a
    # smaller k wastes fewer rejected draft steps per round — sweep it
    # instead of assuming (round-3 shipped k=4 untuned; measured
    # acceptance was only ~0.8/4).
    g_plain = np.asarray(generate(target, prompt, TCFG, STEPS, **KW))
    sample = bytes(
        g_plain[0, :48].astype(np.uint8)
    ).decode("utf-8", "replace")
    t(f"sample continuation: {sample!r}")

    def slope(fn_for_steps):
        lo = measure_device(*fn_for_steps(STEPS), reps=3).min_s
        hi = measure_device(*fn_for_steps(3 * STEPS), reps=3).min_s
        return (hi - lo) / (2 * STEPS) * 1e6

    def plain_at(steps):
        f = lambda tg, p: generate(tg, p, TCFG, steps, **KW)
        return (f, target, prompt)

    p_us = slope(plain_at)
    t(f"plain generate:        {p_us:8.1f} us/tok")

    best = None
    for k_spec in (2, 3, 4):
        g_spec, stats = generate_speculative(
            target, draft, prompt, TCFG, DCFG, STEPS, k=k_spec,
            return_stats=True, **KW,
        )
        g_spec = np.asarray(g_spec)
        exact = bool((g_plain == g_spec).all())
        agree = float((g_plain == g_spec).mean())
        acc = float(stats["mean_accepted"])
        t(f"k={k_spec}: spec == plain tokens: {exact} "
          f"(agreement {agree:.2f}; mean accepted {acc:.2f}/{k_spec} "
          f"per round, {int(stats['rounds'])} rounds)")
        if not exact:
            t("LOSSLESSNESS FAILED — refusing to publish timing numbers")
            raise SystemExit(1)

        def spec_at(steps, k_spec=k_spec):
            f = lambda tg, dr, p: generate_speculative(
                tg, dr, p, TCFG, DCFG, steps, k=k_spec, **KW
            )
            return (f, target, draft, prompt)

        s_us = slope(spec_at)
        t(f"k={k_spec}: spec (distilled draft): {s_us:7.1f} us/tok "
          f"({p_us / s_us:.2f}x vs plain, acceptance {acc:.2f}/{k_spec})")
        if best is None or s_us < best[1]:
            best = (k_spec, s_us)
    t(f"BEST: k={best[0]} at {best[1]:.1f} us/tok "
      f"({p_us / best[1]:.2f}x vs plain)")

    # --- 5) BATCHED spec decode (round 5, VERDICT r4 #2): batch-8 over
    # aligned held-out prompts. The dead-slot design inflates the cache
    # buffer by up to (k+1)x the emitted tokens (models/spec_decode.py),
    # so the serve config gets a bigger buffer; LOGICAL positions stay
    # inside the learned positional table. The ragged-valid attention
    # path is jnp (the flash kernels don't take valid masks), so
    # token-exactness vs plain is not kernel-guaranteed here — agreement
    # is reported, timing published regardless (the win claim is
    # throughput, not losslessness, at batch > 1).
    import dataclasses as _dc

    B = 8
    k_b = best[0]
    need = PROMPT + (3 * STEPS - 1) * (k_b + 1) + 8
    bt = _dc.replace(TCFG, max_len=need)
    bd = _dc.replace(DCFG, max_len=need)
    starts = [
        int(i * (len(HELD) - PROMPT - 1) / B) for i in range(B)
    ]
    prompts = jnp.asarray(
        np.stack([HELD[s : s + PROMPT] for s in starts]), jnp.int32
    )
    gp = np.asarray(generate(target, prompts, TCFG, STEPS, **KW))
    gs = np.asarray(
        generate_speculative(
            target, draft, prompts, bt, bd, STEPS, k=k_b, **KW
        )
    )
    agree = float((gp == gs).mean())
    t(f"batch-8 spec(k={k_b}) vs plain agreement {agree:.2f} "
      "(jnp ragged attention path)")

    def plain_b(steps):
        f = lambda tg, p: generate(tg, p, TCFG, steps, **KW)
        return (f, target, prompts)

    def spec_b(steps):
        f = lambda tg, dr, p: generate_speculative(
            tg, dr, p, bt, bd, steps, k=k_b, **KW
        )
        return (f, target, draft, prompts)

    pb = slope(plain_b) / B
    sb = slope(spec_b) / B
    t(f"batch-8: plain {pb:7.1f} us/tok | spec(k={k_b}) {sb:7.1f} us/tok "
      f"-> {pb / sb:.2f}x")
    t("DONE")


if __name__ == "__main__":
    main()
