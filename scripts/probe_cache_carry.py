"""The measurements behind the flat KV-cache layout (round 3).

Three structures for the same batch-1 ctx-8k decode attention, on-chip:

  A. standalone kernel call (the microbench number);
  B. scan-carried cache + per-step cache write, kernel fed a RESHAPE of
     the carry — a reshape feeding a custom call materializes a
     cache-sized copy every step (this is what ruled out storing the
     cache 4D and reshaping it flat for the kernel);
  C. scan-carried FLAT cache fed to the kernel untouched (the shipped
     layout) — per-step cost returns to ~standalone;
  D. int8 flat cache in the same scan (scale transposes included).

Historical results (2026-08-19, v5e): A 54.6us, B 86.8us/step,
C 57.4us/step, D 60.6us/step. Re-run:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_cache_carry.py
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
from smmb_tpu.kernels.flash_decode import (
    flash_attention_decode,
    flash_attention_decode_quant,
)


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


B, H, KVH, HD = 1, 8, 8, 128
CTX = 8192
S = CTX + 64
KVD = KVH * HD
pos0 = jnp.int32(CTX)
kq, kk, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(kq, (B, H, HD), jnp.bfloat16)
kc = jax.random.normal(kk, (B, S, KVD), jnp.bfloat16)
vc = jax.random.normal(kv, (B, S, KVD), jnp.bfloat16)

# A: standalone
m = measure_device(
    lambda q, kc, vc: flash_attention_decode(q, kc, vc, pos0), q, kc, vc,
    reps=3,
)
t(f"A standalone:                     {m.min_s*1e6:7.1f} us")


def scan_probe(name, kc, vc, ksc=None, vsc=None, reshape_4d=False):
    def gen_like(q, kc, vc, ksc, vsc):
        def step(carry, _):
            kc, vc, ksc, vsc, pos, q = carry
            if reshape_4d:
                # the anti-pattern: reshape of the scan-carried cache
                # feeding the custom call (simulated by a round-trip —
                # XLA folds reshape(reshape(x)) so we go through a real
                # 4D intermediate the way the old layout did)
                o = flash_attention_decode(
                    q,
                    kc.reshape(B, S, KVH, HD).reshape(B, S, KVD),
                    vc.reshape(B, S, KVH, HD).reshape(B, S, KVD),
                    pos,
                )
            elif ksc is not None:
                # round-5 merged layout: kc carries the (B,S,2·KVD) codes
                o = flash_attention_decode_quant(q, kc, ksc, pos)
            else:
                o = flash_attention_decode(q, kc, vc, pos)
            if ksc is not None:
                # merged layout: ONE code dus + ONE scale dus per step
                newkv = jnp.broadcast_to(
                    o.reshape(B, 1, KVD).astype(kc.dtype), (B, 1, 2 * KVD)
                )
                kc = jax.lax.dynamic_update_slice(kc, newkv, (0, pos + 1, 0))
                news = jnp.ones((B, 2 * KVH, 1), jnp.float32)
                ksc = jax.lax.dynamic_update_slice(
                    ksc, news, (0, 0, pos + 1)
                )
            else:
                newk = o.reshape(B, 1, KVD).astype(kc.dtype)
                kc = jax.lax.dynamic_update_slice(kc, newk, (0, pos + 1, 0))
                vc = jax.lax.dynamic_update_slice(vc, newk, (0, pos + 1, 0))
            q2 = (q + o.astype(q.dtype) * 0.001).astype(q.dtype)
            return (kc, vc, ksc, vsc, pos + 1, q2), jnp.sum(o).astype(
                jnp.float32
            )

        (_, _, _, _, _, _), probes = jax.lax.scan(
            step, (kc, vc, ksc, vsc, pos0, q), None, length=16
        )
        return probes[-1]

    m = measure_device(gen_like, q, kc, vc, ksc, vsc, reps=3, iters=16)
    t(f"{name}: {m.min_s*1e6/16:7.1f} us/step")


scan_probe("C flat carry (shipped layout)    ", kc, vc)

kv8 = jax.random.randint(kk, (B, S, 2 * KVD), -127, 127, jnp.int8)
ksc = jax.random.uniform(ks, (B, 2 * KVH, S), jnp.float32, 0.01, 0.03)
scan_probe("D int8 merged carry (round 5)    ", kv8, None, ksc)
t("DONE (variant B — the reshape-fed-custom-call copy — needs the old "
  "4D layout; see git history of kernels/flash_decode.py)")
