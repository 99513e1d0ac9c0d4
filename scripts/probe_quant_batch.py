"""Quantized-cache flash decode at large batch (ADVICE r4, low #3).

The decode gate (models/attention.attention_decode_core) routes ANY batch
through the flash kernel when the cache is int8, because the jnp fallback
re-materializes a dequantized cache every step. Round-4 measurements only
covered b<=8; this probe measures the int8 kernel (merged round-5 layout)
vs the jnp dequant path at b=8/16/32 (MHA and GQA/2) so the unconditional
quant arm rests on data. The jnp path is only measured at b=8 (its
dequantized materialization is the known-terrible case; at b>=16 it
allocates multi-GB transients).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_quant_batch.py
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

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.kernels.flash_decode import flash_attention_decode_quant
from smmb_tpu.models.attention import _cache_kv, _decode_attention_math

HBM_GBPS = 819.0


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def probe(B, H, KVH, S, pos_v, with_jnp):
    hd = 128
    key = jax.random.PRNGKey(0)
    kk, kv, kq = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, hd), jnp.bfloat16)
    kf = jax.random.normal(kk, (B, S, KVH, hd), jnp.float32)
    vf = jax.random.normal(kv, (B, S, KVH, hd), jnp.float32)
    # merged interleaved layout (models/attention.init_kv_cache round 5)
    from smmb_tpu.models.attention import _quantize_kv

    kq8, ks = _quantize_kv(kf)
    vq8, vs = _quantize_kv(vf)
    kvm = jnp.stack([kq8, vq8], axis=3).reshape(B, S, 2 * KVH * hd)
    scm = (
        jnp.stack([ks[..., 0], vs[..., 0]], axis=3)
        .reshape(B, S, 2 * KVH)
        .transpose(0, 2, 1)
    )
    pos = jnp.int32(pos_v)

    kern = jax.jit(
        lambda q, kvm, scm: flash_attention_decode_quant(
            q, kvm, scm, pos, compute_dtype=jnp.bfloat16
        )
    )

    def jnp_path(q, kvm, scm):
        kc, vc = _cache_kv({"kv": kvm, "kv_scale": scm}, KVH)
        return _decode_attention_math(
            q[:, None].astype(jnp.float32), kc, vc, pos, hd
        )

    a = np.asarray(kern(q, kvm, scm), np.float32)
    b = np.asarray(jax.jit(jnp_path)(q, kvm, scm), np.float32).reshape(a.shape)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
    mk = measure_device(kern, q, kvm, scm, rotate_argnums=(1,)).min_s * 1e6
    mj = (
        measure_device(
            jax.jit(jnp_path), q, kvm, scm, rotate_argnums=(1,)
        ).min_s * 1e6
        if with_jnp
        else float("nan")
    )
    floor = B * (pos_v + 1) * KVH * hd * 2 * 1 / HBM_GBPS / 1e3
    name = "MHA" if KVH == H else f"GQA/{KVH}"
    t(
        f"int8 B={B:2d} {name:5s} S={S} pos={pos_v}: kernel {mk:7.1f} us | "
        f"jnp-dequant {mj:7.1f} us | live-floor {floor:5.1f} us | "
        f"rel-err {err:.1e}"
    )


t(f"devices: {jax.devices()}")
for B in (8, 16, 32):
    for kvh in (8, 2):
        probe(B, 8, kvh, 8192, 7999, with_jnp=(B == 8))
t("DONE")
