"""Trace the int8-vs-bf16 LM decode SCAN at ctx 8k (VERDICT r4 item #2).

The int8 flash-decode kernel wins standalone (~49 vs 64 µs @8k MHA) yet
the int8 LM still decodes slower end-to-end (314.6 vs 301.3 µs/tok after
the scale-layout change — measured this round). This probe traces the real
serving regime — a jitted lax.scan of decode steps with the cache as
carry — for both cache dtypes and prints the per-op device tables, to
locate the ~18 µs/layer of int8-specific overhead.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_int8_step.py
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

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.trace import capture_trace
from smmb_tpu.models.lm import (
    TernaryLMConfig,
    init_lm,
    lm_decode_step,
    lm_init_cache,
    lm_prefill,
    pack_lm,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from profile_kernels import report  # reuse the xplane aggregation


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


CTX = 8192
NSTEP = 8
CFG = TernaryLMConfig(
    vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
    max_len=CTX + NSTEP + 8,
)
KW = dict(compute_dtype=jnp.bfloat16, use_kernel=True, use_flash=True)


def main():
    t(f"devices: {jax.devices()}")
    packed = pack_lm(init_lm(jax.random.PRNGKey(0), CFG))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, CTX), 0, CFG.vocab)

    for kvq in (False, True):
        name = "int8" if kvq else "bf16"
        cache = lm_init_cache(
            CFG, 1, dtype=jnp.bfloat16, quantized=kvq
        )
        logits, cache = lm_prefill(packed, toks, cache, CFG, **KW)
        tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        @jax.jit
        def scan_steps(tok0, cache):
            def body(c, _):
                tok, cache = c
                lg, cache = lm_decode_step(packed, tok, cache, CFG, **KW)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (_, cache), out = jax.lax.scan(
                body, (tok0, cache), None, length=NSTEP
            )
            return out

        t(f"tracing {name} decode scan ({NSTEP} steps)...")
        d = capture_trace(
            scan_steps, tok0, cache,
            trace_dir=f"/tmp/smmb_prof_step_{name}", n_calls=6,
        )
        lines = []
        report(
            f"LM decode scan ctx{CTX} {name} cache, flash decode "
            f"(4 layers, 6 calls × {NSTEP} steps)",
            d, 6, lines,
        )
    t("DONE")


if __name__ == "__main__":
    main()
