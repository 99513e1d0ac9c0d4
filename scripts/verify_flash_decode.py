"""On-chip verification + timing of the flash-decode kernel.

Parity vs a float64 numpy oracle (f32 inputs, HIGHEST), then the numbers
that motivated the kernel (bench_out/kvq_crossover.txt): per-step decode
attention at long context — jnp path vs kernel, bf16 and int8 cache.
Validation gates timing (reference invariant main.cpp:317-320).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_flash_decode.py
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

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.kernels.flash_decode import flash_attention_decode
from smmb_tpu.models.attention import _cache_kv, _decode_attention_math


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


t(f"devices: {jax.devices()}")
FAILED = False


def gate(name, err, tol=1e-5):
    global FAILED
    ok = err < tol
    t(f"{name}: err={err:.2e} " + ("PASS" if ok else "FAIL"))
    FAILED = FAILED or not ok


# ---- parity: f32, f64 oracle, MHA + GQA + window ----
B, S, HD = 1, 2048, 128
POS = 1234
for h, kvh, window in [(8, 8, None), (8, 2, None), (8, 2, 256)]:
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(h), 3)
    q = jax.random.normal(kq, (B, h, HD), jnp.float32)
    kc = jax.random.normal(kk, (B, S, kvh, HD), jnp.float32)
    vc = jax.random.normal(kv, (B, S, kvh, HD), jnp.float32)
    y = np.asarray(
        flash_attention_decode(
            q, kc.reshape(B, S, kvh * HD), vc.reshape(B, S, kvh * HD),
            jnp.int32(POS), window=window,
        )
    )
    qn, kn, vn = (np.asarray(a, np.float64) for a in (q, kc, vc))
    g = h // kvh
    scale = 1.0 / np.sqrt(HD)
    lo = 0 if window is None else max(0, POS - window + 1)
    want = np.empty((B, h, HD))
    for hh in range(h):
        s = (qn[:, hh : hh + 1] @
             kn[:, lo : POS + 1, hh // g].transpose(0, 2, 1)) * scale
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want[:, hh] = (p @ vn[:, lo : POS + 1, hh // g])[:, 0]
    gate(f"H{h}/KV{kvh} win={window} vs f64", np.abs(y - want).max())

if FAILED:
    t("VALIDATION FAILED — refusing to publish timing numbers")
    raise SystemExit(1)

# ---- timing: per-step decode attention at long context ----
# jnp baselines measure with ROTATED caches (measure.py rotate_argnums):
# a loop-invariant cache small enough to pin in on-chip memory reads
# below the HBM floor (round-3's impossible 4.0/6.6 us GQA rows —
# diagnosed in scripts/probe_subfloor.py; the dynamic-slice indexing
# fuses into the einsums, verified +3% on the non-pinnable MHA case).
# The Pallas kernel streams tiles from HBM by construction and its
# committed rows sit above floor, so it measures unrotated; any printed
# number below its traffic floor FAILS the run (VERDICT r3 #9).
SUBFLOOR = []


def row(tag, floor_us, jnp_us, kernel_us):
    t(f"{tag}: jnp {jnp_us:7.1f} us | kernel {kernel_us:7.1f} us | "
      f"traffic floor {floor_us:.1f} us")
    for which, v in (("jnp", jnp_us), ("kernel", kernel_us)):
        if v < floor_us:
            SUBFLOOR.append(f"{tag} {which} {v:.1f} < floor {floor_us:.1f}")


for ctx, kvh_, name in [(8192, 8, "MHA"), (16384, 8, "MHA"),
                        (8192, 2, "GQA/2"), (16384, 2, "GQA/2")]:
    h = 8
    S2 = ctx + 64
    pos = jnp.int32(ctx)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, h, HD), jnp.bfloat16)
    kcb = jax.random.normal(kk, (B, S2, kvh_, HD), jnp.bfloat16)
    vcb = jax.random.normal(kv, (B, S2, kvh_, HD), jnp.bfloat16)
    kcf = kcb.reshape(B, S2, kvh_ * HD)
    vcf = vcb.reshape(B, S2, kvh_ * HD)

    mj = measure_device(
        lambda q, kc, vc: _decode_attention_math(
            q[:, None], kc, vc, pos, HD
        ),
        q, kcb, vcb, reps=3, rotate_argnums=(1, 2),
    )
    mk = measure_device(
        lambda q, kc, vc: flash_attention_decode(q, kc, vc, pos),
        q, kcf, vcf, reps=3,
    )
    floor = 2 * ctx * kvh_ * HD * 2 / 819e9 * 1e6  # live KV bytes @ HBM BW
    row(f"bf16 {name} ctx={ctx}", floor, mj.min_s * 1e6, mk.min_s * 1e6)

    # int8 cache: quantize the same values into the MERGED round-5 layout
    # (models/attention.init_kv_cache: kv (B,S,2·KVH·hd) interleaved codes
    # + kv_scale (B,2·KVH,S))
    from smmb_tpu.kernels.flash_decode import flash_attention_decode_quant
    from smmb_tpu.models.attention import _quantize_kv

    kq8, ks = _quantize_kv(kcb)
    vq8, vs = _quantize_kv(vcb)
    kvm = jnp.stack([kq8, vq8], axis=3).reshape(B, S2, 2 * kvh_ * HD)
    scm = (
        jnp.stack([ks[..., 0], vs[..., 0]], axis=3)
        .reshape(B, S2, 2 * kvh_)
        .transpose(0, 2, 1)
    )

    def jnp_int8(q, kvm, scm):
        cache = {"kv": kvm, "kv_scale": scm}
        kc, vc = _cache_kv(cache, kvh_)
        return _decode_attention_math(q[:, None], kc, vc, pos, HD)

    mjq = measure_device(
        jnp_int8, q, kvm, scm, reps=3, rotate_argnums=(1,)
    )
    mkq = measure_device(
        lambda q, kvm, scm: flash_attention_decode_quant(q, kvm, scm, pos),
        q, kvm, scm, reps=3,
    )
    floor8 = ctx * kvh_ * HD * 2 / 819e9 * 1e6  # int8 halves KV bytes
    row(f"int8 {name} ctx={ctx}", floor8, mjq.min_s * 1e6, mkq.min_s * 1e6)

if SUBFLOOR:
    t("SUBFLOOR readings (physically impossible as cache reads) — FAIL:")
    for s in SUBFLOOR:
        t("  " + s)
    raise SystemExit(1)
t("DONE")
