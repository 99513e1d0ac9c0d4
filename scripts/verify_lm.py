"""Hardware verification of the end-to-end ternary LM (models/lm.py).

Drives the full serving path on the real chip: prefill + jitted greedy
``generate`` (lax.scan of KV-cache decode steps), checks decode-vs-forward
logits parity on-device, and times generation tokens/s at batch 1.
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

import jax.numpy as jnp
import numpy as np

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    generate,
    init_lm,
    lm_decode_step,
    lm_forward,
    lm_init_cache,
    lm_prefill,
    pack_lm,
)


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


CFG = TernaryLMConfig(
    vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4, max_len=256
)
STEPS = 64
t(f"devices: {jax.devices()}  cfg={CFG}")

params = init_lm(jax.random.PRNGKey(0), CFG)
packed = pack_lm(params)
toks = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, CFG.vocab)

# parity: one decode step == full forward last position (on-chip, HIGHEST —
# at default precision the full and incremental paths round differently)
HI = jax.lax.Precision.HIGHEST
full = lm_forward(packed, toks, CFG, precision=HI)
cache = lm_init_cache(CFG, batch=1)
_, cache = lm_prefill(packed, toks[:, :-1], cache, CFG, precision=HI)
step_logits, _ = lm_decode_step(packed, toks[:, -1], cache, CFG, precision=HI)
err = np.abs(np.asarray(step_logits) - np.asarray(full[:, -1])).max()
t(f"decode-vs-forward logits parity (HIGHEST): err={err:.2e} "
  + ("PASS" if err < 5e-3 else "FAIL"))

# greedy generation end-to-end (bf16 serving dtype), then time it
out = generate(packed, toks, CFG, STEPS, compute_dtype=jnp.bfloat16)
out.block_until_ready()
t(f"generate: {out.shape} tokens, sample={np.asarray(out)[0, :8]}")


def time_gen(steps, n_timed=5):
    out = generate(packed, toks, CFG, steps, compute_dtype=jnp.bfloat16)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = generate(packed, toks, CFG, steps, compute_dtype=jnp.bfloat16)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n_timed


# two step counts; the slope cancels dispatch + prefill
d_lo, d_hi = time_gen(STEPS), time_gen(STEPS * 3)
per_tok = (d_hi - d_lo) / (2 * STEPS)
t(
    f"TIME generate batch=1 prompt=32: steps={STEPS}: {d_lo * 1e3:.2f}ms, "
    f"steps={STEPS * 3}: {d_hi * 1e3:.2f}ms -> slope {per_tok * 1e6:.1f}us/tok "
    f"= {1.0 / per_tok:.0f} tok/s device-side"
)
