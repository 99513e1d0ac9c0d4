"""int8-KV-cache crossover sweep (VERDICT r2 #7).

Round 2 benched the quantized cache at ONE point (ctx 512) where it is a
19% slowdown — the per-step dequant costs more than the saved cache-read
bytes while the weights dominate. The cache read grows linearly with
context (2·ctx·d_model·bytes per layer per step); this sweep finds where
int8 starts paying, for MHA and GQA.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_kvq_crossover.py
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

from smmb_tpu.bench.lm_bench import run_lm_bench
from smmb_tpu.models.lm import TernaryLMConfig


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


STEPS = 64
t(f"devices: {jax.devices()}")
print(f"{'ctx':>6} {'heads':>8} {'bf16 us/tok':>12} {'int8 us/tok':>12} "
      f"{'int8/bf16':>10}", flush=True)

for ctx, kvh in [
    (2048, None),
    (8192, None),
    (16384, None),
    (8192, 2),
    (16384, 2),
]:
    cfg = TernaryLMConfig(
        vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
        max_len=ctx + 3 * STEPS + 8, n_kv_heads=kvh,
    )
    res = {}
    for kvq in (False, True):
        try:
            r = run_lm_bench(
                cfg, prompt_len=ctx, steps=STEPS, reps=3, kv_quant=kvq,
                use_flash=True,
            )
            res[kvq] = r.per_token_s * 1e6
        except Exception as e:
            t(f"ctx={ctx} kvh={kvh} kvq={kvq}: FAILED "
              f"{type(e).__name__}: {str(e)[:100]}")
            res[kvq] = float("nan")
    name = "MHA" if kvh is None else f"GQA/{kvh}"
    print(f"{ctx:>6} {name:>8} {res[False]:>12.1f} {res[True]:>12.1f} "
          f"{res[True]/res[False]:>10.2f}", flush=True)
t("DONE")
