"""Long-context prefill attention on the real chip: Pallas flash kernel vs
the jnp einsum path (models/attention._attention_math).

The einsum path writes + reads the (B, H, T, T) f32 score tensor through
HBM twice (~2.1 GB at T=4096, H=16); the flash kernel keeps scores in VMEM
so its traffic is Q+KV+O only and the causal work is compute-bound. Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_flash.py
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

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.kernels.flash_attention import flash_attention
from smmb_tpu.models.attention import TernaryAttentionConfig, _attention_math


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


t(f"devices: {jax.devices()}")

HD = 128
PEAK_BF16 = 197e12  # v5e MXU, bf16
HBM_BW = 819e9  # v5e

for (b, h, kvh, T, iters_flash, iters_ein) in [
    (1, 16, 16, 4096, 512, 64),
    (1, 16, 4, 8192, 128, 16),
]:
    d = h * HD
    cfg = TernaryAttentionConfig(
        d_model=d, n_heads=h, causal=True,
        n_kv_heads=kvh if kvh != h else None,
    )
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = jnp.bfloat16
    q4 = jax.random.normal(kq, (b, h, T, HD), dt)
    k4 = jax.random.normal(kk, (b, kvh, T, HD), dt)
    v4 = jax.random.normal(kv, (b, kvh, T, HD), dt)
    # einsum path takes (B, T, D) flattened projections
    q2 = q4.transpose(0, 2, 1, 3).reshape(b, T, h * HD)
    k2 = k4.transpose(0, 2, 1, 3).reshape(b, T, kvh * HD)
    v2 = v4.transpose(0, 2, 1, 3).reshape(b, T, kvh * HD)

    # causal: half the T*T scores are live
    flops = 4 * b * h * T * T * HD / 2
    sol_us = flops / PEAK_BF16 * 1e6
    score_gb = 2 * b * h * T * T * 4 / 1e9  # write + read, f32

    t(f"--- B={b} H={h} KVH={kvh} T={T} (SOL compute {sol_us:.0f} us, "
      f"einsum score traffic {score_gb:.1f} GB) ---")

    t("compiling flash...")
    m = measure_device(
        lambda q, k, v: flash_attention(q, k, v, causal=True),
        q4, k4, v4, iters=iters_flash,
    )
    fl_us = m.min_s * 1e6
    t(f"flash:  {fl_us:9.1f} us  ({flops / m.min_s / 1e12:.1f} TFLOP/s, "
      f"{flops / m.min_s / PEAK_BF16:.2f} of MXU peak)")

    t("compiling einsum path...")
    m = measure_device(
        lambda q, k, v: _attention_math(q, k, v, cfg), q2, k2, v2,
        iters=iters_ein,
    )
    ein_us = m.min_s * 1e6
    t(f"einsum: {ein_us:9.1f} us  -> flash speedup {ein_us / fl_us:.2f}x")
