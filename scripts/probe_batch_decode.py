"""Batch>1 flash-decode re-measurement (VERDICT r3 #6).

Round 3 gated the flash-decode cache read to batch 1: its (B, KVH, s) grid
measured 511.3 us/step vs jnp's 385.8 at batch 8 MHA ctx 1000
(bench_out/lm_batch8.txt). Round 4 folded the KV-head loop into the kernel
(grid (B, s) — KVH x fewer grid steps, fully contiguous DMAs); this probe
re-measures both the standalone cache-read op and the end-to-end LM step at
batch 8 to decide whether the gate (models/attention.FLASH_DECODE_MAX_BATCH)
can be lifted.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_batch_decode.py
"""

import time

T0 = time.time()

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from smmb_tpu.utils.stamp import print_stamp
print_stamp()
import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import smmb_tpu.models.attention as attention
from smmb_tpu.bench.measure import measure_device
from smmb_tpu.kernels.flash_decode import flash_attention_decode
from smmb_tpu.models.attention import _decode_attention_math

HBM_GBPS = 819.0


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def standalone(B, H, KVH, S, pos_v, dtype):
    hd = 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, hd), dtype)
    kc = jax.random.normal(kk, (B, S, KVH * hd), dtype)
    vc = jax.random.normal(kv, (B, S, KVH * hd), dtype)
    pos = jnp.int32(pos_v)

    kern = jax.jit(lambda q, kc, vc: flash_attention_decode(q, kc, vc, pos))

    def jnp_path(q, kc, vc):
        kc4 = kc.reshape(B, S, KVH, hd)
        vc4 = vc.reshape(B, S, KVH, hd)
        return _decode_attention_math(q[:, None], kc4, vc4, pos, hd)

    jnpf = jax.jit(jnp_path)
    # parity first (kernel vs jnp math)
    a = np.asarray(kern(q, kc, vc), np.float32)
    b = np.asarray(jnpf(q, kc, vc), np.float32).reshape(a.shape)
    err = np.abs(a - b).max()
    mk = measure_device(kern, q, kc, vc, rotate_argnums=(1, 2)).min_s * 1e6
    mj = measure_device(jnpf, q, kc, vc, rotate_argnums=(1, 2)).min_s * 1e6
    floor = (
        B * (pos_v + 1) * KVH * hd * 2 * jnp.dtype(dtype).itemsize
        / HBM_GBPS / 1e3
    )
    name = "MHA" if KVH == H else f"GQA/{KVH}"
    t(
        f"standalone B={B} {name} S={S} pos={pos_v} {jnp.dtype(dtype).name}: "
        f"kernel {mk:6.1f} us | jnp {mj:6.1f} us | live-floor {floor:5.1f} us"
        f" | parity {err:.1e}"
    )
    return mk, mj


def lm_level(batch, kvh, use_flash, ctx=1000):
    from smmb_tpu.bench.lm_bench import run_lm_bench
    from smmb_tpu.models.lm import TernaryLMConfig

    cfg = TernaryLMConfig(
        vocab=8192, d_model=1024, n_heads=8, d_ff=4096, n_layers=4,
        max_len=ctx + 3 * 64 + 8, n_kv_heads=kvh,
    )
    r = run_lm_bench(
        cfg, batch=batch, prompt_len=ctx, steps=64, reps=3,
        use_flash=use_flash,
    )
    return r.per_token_s * 1e6


t(f"devices: {jax.devices()}")

t("--- standalone decode attention, batch 8, ctx 1000 (cache S=1024) ---")
for kvh in (8, 2):
    for dt in (jnp.bfloat16,):
        standalone(8, 8, kvh, 1024, 999, dt)

t("--- end-to-end LM decode step, batch 8 "
  "(round-3 baseline ctx1000: jnp 385.8 MHA / 86.8 GQA2; kernel 511.3 / "
  "167.8) ---")
# force the kernel onto every use_flash row, including the small-cache
# regime the shipped gate routes to jnp — this probe is the evidence the
# gate's threshold rests on
attention.FLASH_DECODE_MIN_CACHE_BYTES = 0
for kvh, label, ctx in (
    (None, "MHA", 1000),
    (2, "GQA2", 1000),
    (2, "GQA2", 8000),
):
    res = {}
    for uf in (False, True):
        try:
            res[uf] = lm_level(8, kvh, use_flash=uf, ctx=ctx)
        except Exception as e:
            # the jnp path cannot prefill long batched contexts (its
            # (B,KVH,G,T,T) score tensor OOMs — 15.4 GB at b8 ctx8000);
            # record that as the comparison outcome, don't crash the probe
            t(f"LM batch8 {label} ctx{ctx} use_flash={uf}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}")
            res[uf] = None
    us_j, us_k = res[False], res[True]
    if us_j is None and us_k is not None:
        t(f"LM batch8 {label} ctx{ctx}: kernel {us_k:6.1f} us/step | "
          f"jnp CANNOT RUN (prefill OOM) -> KERNEL ONLY VIABLE PATH")
    elif us_k is not None:
        verdict = "KERNEL WINS" if us_k <= us_j else "jnp wins"
        t(f"LM batch8 {label} ctx{ctx}: kernel {us_k:6.1f} us/step | "
          f"jnp {us_j:6.1f} us/step -> {verdict}")
t("DONE")
