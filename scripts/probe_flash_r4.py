"""Flash prefill tile probe, round 4 (VERDICT r3 #8: 0.51 → ≥0.65 of MXU
peak at T=4096 causal MHA bf16).

Round 3 tuned to 1024/1024 and landed the exp2 + diag-mask VPU work; this
probe pushes the remaining per-step overhead: larger KV tiles (fewer grid
steps per byte), larger q tiles (fewer KV re-fetch rounds), and the
diag-mask path at 2048² tiles. VMEM check: q 0.5 MB + kv 4 MB (double-
buffered pair at bs=2048) + acc 1 MB + mask ≤ 4 MB stays inside 16 MB.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_flash_r4.py
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
flops = 4 * B * H * T * T * HD / 2  # causal: half the square

# f64 oracle on one head for parity sanity of every variant
def oracle_head(qh, kh, vh):
    s = np.asarray(qh, np.float64) @ np.asarray(kh, np.float64).T / np.sqrt(HD)
    mask = np.tril(np.ones((T, T), bool))
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return p @ np.asarray(vh, np.float64)

ORC = oracle_head(q[0, 0], k[0, 0], v[0, 0])

t(f"devices: {jax.devices()}  SOL {flops/PEAK*1e6:.0f} us")
for bq, bkv in [
    (1024, 1024),  # round-3 shipped default
    (2048, 1024),
    (1024, 2048),
    (2048, 2048),
    (4096, 1024),
    (1024, 4096),
    (2048, 4096),
]:
    try:
        fn = lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_q=bq, block_kv=bkv
        )
        out = fn(q, k, v)
        err = np.abs(np.asarray(out[0, 0], np.float64) - ORC).max()
        rel = err / np.abs(ORC).max()
        m = measure_device(fn, q, k, v, iters=256, reps=4)
        us = m.min_s * 1e6
        t(
            f"bq={bq:<5} bkv={bkv:<5}: {us:7.1f} us "
            f"({flops/m.min_s/1e12:5.1f} TF/s, {flops/m.min_s/PEAK:.2f} of "
            f"peak) parity rel={rel:.1e}"
        )
    except Exception as e:
        t(f"bq={bq} bkv={bkv}: FAILED {type(e).__name__}: {str(e)[:100]}")
t("DONE")
