"""Diagnose the sub-floor jnp GQA decode baselines (round-3 VERDICT #9).

verify_flash_decode.txt committed jnp GQA bf16 rows of 4.0/6.6 µs at ctx
8k/16k — below the 10.2/20.5 µs HBM traffic floors for the live KV bytes,
physically impossible as cache reads. Hypotheses:

  (a) the measure_device scan carries the cache loop-invariantly, and the
      8-17 MB GQA cache gets pinned in VMEM across iterations (the MHA
      cache at 33+ MB does not fit, and its numbers were above-floor);
  (b) reps=3 makes the 2·t_R − t_2R overhead-median noisy enough to
      over-subtract.

This probe times the same jnp GQA decode with four protocols:
  1. measure_device reps=3 (the artifact's configuration);
  2. measure_device reps=10;
  3. wall-clock batched measure() (dispatch-bound upper bound);
  4. measure_device over R rotated cache copies (total footprint >> VMEM,
     dynamic-indexed per iteration) — forces true HBM traffic.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_subfloor.py
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

from smmb_tpu.bench.measure import measure, measure_device
from smmb_tpu.models.attention import _decode_attention_math


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


t(f"devices: {jax.devices()}")

B, HD, H = 1, 128, 8

for ctx, kvh in [(8192, 2), (16384, 2), (8192, 8)]:
    S2 = ctx + 64
    pos = jnp.int32(ctx)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, HD), jnp.bfloat16)
    kcb = jax.random.normal(kk, (B, S2, kvh, HD), jnp.bfloat16)
    vcb = jax.random.normal(kv, (B, S2, kvh, HD), jnp.bfloat16)
    floor = 2 * ctx * kvh * HD * 2 / 819e9 * 1e6
    mb = 2 * S2 * kvh * HD * 2 / 1e6

    fn = lambda q, kc, vc: _decode_attention_math(q[:, None], kc, vc, pos, HD)

    m3 = measure_device(fn, q, kcb, vcb, reps=3)
    m10 = measure_device(fn, q, kcb, vcb, reps=10)
    mw = measure(jax.jit(fn), q, kcb, vcb, reps=5)

    # rotation: R copies, footprint R*mb MB >> 128 MB VMEM
    R = max(2, int(np.ceil(512 / mb)))
    kst = jnp.stack([kcb + i for i in range(R)])
    vst = jnp.stack([vcb + i for i in range(R)])

    def rot_fn(q, kst, vst, i):
        kc = jax.lax.dynamic_index_in_dim(kst, i % R, 0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(vst, i % R, 0, keepdims=False)
        out = _decode_attention_math(q[:, None], kc, vc, pos, HD)
        return out, (i + 1) % (1 << 30)

    # manual scan timing with rotation carried in the loop
    def rot_loop(n_iters):
        def run(q, kst, vst):
            def body(carry, _):
                qq, i = carry
                out, i = rot_fn(qq, kst, vst, i)
                live = jnp.sum(jnp.abs(out)).astype(jnp.float32)
                qq = jnp.where(live < jnp.inf, qq, jnp.zeros_like(qq))
                return (qq, i), live

            (_, _), probes = jax.lax.scan(
                body, (q, jnp.int32(0)), None, length=n_iters
            )
            return probes[-1]

        return jax.jit(run)

    iters = 4096
    loop = rot_loop(iters)
    loop2 = rot_loop(2 * iters)
    float(loop(q, kst, vst))  # compile
    float(loop2(q, kst, vst))
    ts, tl = [], []
    for _ in range(5):
        t0 = time.perf_counter(); float(loop(q, kst, vst))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(loop2(q, kst, vst))
        tl.append(time.perf_counter() - t0)
    ts, tl = np.array(ts), np.array(tl)
    ovh = max(0.0, float(np.median(2 * ts - tl)))
    per = np.concatenate([(ts - ovh) / iters, (tl - ovh) / (2 * iters)])
    per = per[per > 0]
    rot_us = per.min() * 1e6 if len(per) else float("nan")

    t(
        f"ctx={ctx} kvh={kvh} ({mb:.1f}MB cache, floor {floor:.1f}us): "
        f"md_reps3 {m3.min_s*1e6:6.1f} | md_reps10 {m10.min_s*1e6:6.1f} | "
        f"wall {mw.min_s*1e6:6.1f} | rotated(R={R}) {rot_us:6.1f} us"
    )

t("DONE")
