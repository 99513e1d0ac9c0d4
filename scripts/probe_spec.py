"""Decompose the speculative-decoding overhead (VERDICT r2 weak #5).

spec-self (draft==target, full acceptance) measured 282 us/tok vs plain's
85.9 — 3.3x — while the cost model says (k+2)/(k+1) = 1.2x. Measure each
component of a spec round on the chip to find where the extra ~196 us/tok
lives:

  A. plain generate slope            (the baseline us/tok)
  B. single lm_decode_step loop      (a draft step's true cost)
  C. single lm_extend(k+1 chunk)     (the verify's true cost)
  D. one full spec body round        (5 decode steps + 1 extend + prefix
                                      logic + cache rewinds, via a 1-round
                                      while loop)
  E. generate_speculative slope      (the committed number's shape)

If D >> 5*B + C, the loop plumbing (while_loop carry copies, traced-pos
cache writes) is the problem; if C >> B, the verify chunk is.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_spec.py
"""

import time

T0 = time.time()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import functools

import jax.numpy as jnp

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_decode_step,
    lm_extend,
    lm_init_cache,
    lm_prefill,
    pack_lm,
)
from smmb_tpu.models.spec_decode import generate_speculative


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


K_SPEC = 4
STEPS = 64
PROMPT = 32
CFG = TernaryLMConfig(
    vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
    max_len=PROMPT + 3 * STEPS + K_SPEC + 1,
)
KW = dict(compute_dtype=jnp.bfloat16, use_kernel=True)

t(f"devices: {jax.devices()}")
target = pack_lm(init_lm(jax.random.PRNGKey(0), CFG))
prompt = jax.random.randint(jax.random.PRNGKey(2), (1, PROMPT), 0, CFG.vocab)

# build a mid-generation cache state to measure steps at a realistic pos
cache0 = lm_init_cache(CFG, 1, dtype=jnp.bfloat16)
logits, cache0 = lm_prefill(target, prompt, cache0, CFG, **KW)
tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
cache0 = jax.block_until_ready(cache0)

# --- A. plain generate slope ---
def plain(steps):
    f = lambda tg, p: generate(tg, p, CFG, steps, **KW)
    return measure_device(f, target, prompt, reps=3).min_s

lo, hi = plain(STEPS), plain(3 * STEPS)
a_us = (hi - lo) / (2 * STEPS) * 1e6
t(f"A plain generate:        {a_us:8.1f} us/tok")

# --- B. one decode step (jitted alone, fixed cache input) ---
@functools.partial(jax.jit, static_argnames=())
def one_step(tok, cache):
    lg, c = lm_decode_step(target, tok, cache, CFG, **KW)
    return jnp.argmax(lg, axis=-1).astype(jnp.int32), c

m = measure_device(one_step, tok0, cache0, reps=3)
t(f"B lm_decode_step:        {m.min_s*1e6:8.1f} us")

# --- C. one verify extend (k+1 = 5-token chunk) ---
chunk = jnp.concatenate(
    [tok0[:, None]] * (K_SPEC + 1), axis=1
).astype(jnp.int32)

@jax.jit
def one_extend(chunk, cache):
    lg, c = lm_extend(target, chunk, cache, CFG, **KW)
    return jnp.argmax(lg, axis=-1).astype(jnp.int32), c

m = measure_device(one_extend, chunk, cache0, reps=3)
t(f"C lm_extend(5):          {m.min_s*1e6:8.1f} us")

# --- D. one full spec round (the while body, single iteration) ---
@jax.jit
def one_round(tok, tc, dc):
    p_t, p_d = tc[0]["pos"], dc[0]["pos"]

    def dstep(c, _):
        tok, cache = c
        lg, cache = lm_decode_step(target, tok, cache, CFG, **KW)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, dc), ds = jax.lax.scan(dstep, (tok, dc), None, length=K_SPEC + 1)
    drafts = ds[:K_SPEC, 0]
    chunk = jnp.concatenate([tok[:, None], drafts[None, :]], axis=1)
    vlogits, tc = lm_extend(target, chunk, tc, CFG, **KW)
    preds = jnp.argmax(vlogits, axis=-1)[0].astype(jnp.int32)
    match = (preds[:K_SPEC] == drafts).astype(jnp.int32)
    n_acc = jnp.sum(jnp.cumprod(match))
    nxt = jnp.take(preds, n_acc)
    tc = [{**c, "pos": p_t + n_acc + 1} for c in tc]
    dc = [{**c, "pos": p_d + n_acc + 1} for c in dc]
    return nxt[None], tc, dc

dc0 = jax.tree.map(lambda a: a, cache0)  # same-model draft cache
m = measure_device(one_round, tok0, cache0, dc0, reps=3)
d_us = m.min_s * 1e6
t(f"D one spec round:        {d_us:8.1f} us "
  f"(per tok /{K_SPEC+1}: {d_us/(K_SPEC+1):.1f})")

# --- E. generate_speculative slope (self-draft) ---
def spec(steps):
    f = lambda tg, dr, p: generate_speculative(
        tg, dr, p, CFG, CFG, steps, k=K_SPEC, **KW
    )
    return measure_device(f, target, target, prompt, reps=3).min_s

lo, hi = spec(STEPS), spec(3 * STEPS)
e_us = (hi - lo) / (2 * STEPS) * 1e6
t(f"E spec-self slope:       {e_us:8.1f} us/tok")
t(f"   model: D/5 should be ~E; 5*B+C = {5*0 + 0:.0f} -- compare above")
t("DONE")
