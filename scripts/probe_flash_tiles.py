"""Flash-attention block-size tune at the bench_flash headline shape
(B1 H16 MHA T4096 bf16 causal) — VERDICT r2 #5: the shipped bq<=256 /
bkv<=512 defaults were untuned guesses and the kernel sat at 0.22 of MXU
peak. Run after the masked/unmasked tile split.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_flash_tiles.py
"""

import time

T0 = time.time()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.kernels.flash_attention import flash_attention


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


B, H, T, HD = 1, 16, 4096, 128
PEAK = 197e12
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (B, H, T, HD), jnp.bfloat16)
k = jax.random.normal(kk, (B, H, T, HD), jnp.bfloat16)
v = jax.random.normal(kv, (B, H, T, HD), jnp.bfloat16)
flops = 4 * B * H * T * T * HD / 2

t(f"devices: {jax.devices()} SOL {flops/PEAK*1e6:.0f} us")
results = []
for bq, bkv in [
    (256, 512),   # shipped default
    (512, 512),
    (256, 1024),
    (512, 1024),
    (1024, 512),
    (256, 2048),
    (512, 256),
    (128, 512),
]:
    try:
        m = measure_device(
            lambda q, k, v: flash_attention(
                q, k, v, causal=True, block_q=bq, block_kv=bkv
            ),
            q, k, v, iters=256, reps=4,
        )
    except Exception as e:
        t(f"bq={bq} bkv={bkv}: FAILED {type(e).__name__}: {str(e)[:80]}")
        continue
    us = m.min_s * 1e6
    t(f"bq={bq:5d} bkv={bkv:5d}: {us:8.1f} us  ({flops/m.min_s/PEAK:.3f} of peak)")
    results.append((us, bq, bkv))

results.sort()
t("=== ranked ===")
for us, bq, bkv in results:
    t(f"{us:8.1f} us  bq={bq} bkv={bkv}")
