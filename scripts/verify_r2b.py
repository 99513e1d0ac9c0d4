"""Hardware re-verification of the two round-2 fixes: scratch-decode BCSR
kernel (parity + timing) and attention decode-vs-full at HIGHEST."""

import time

T0 = time.time()
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.bcsr import bcsr_from_dense
from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas
from smmb_tpu.utils import rng


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def check(name, got, oracle, tol):
    err = np.abs(np.asarray(got, np.float64) - oracle).max()
    t(f"{name}: err={err:.2e} " + ("PASS" if err < tol else "FAIL"))
    return err < tol


t(f"devices: {jax.devices()}")
kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
ok = True

# --- BCSR scratch-decode kernel: parity + timing ---
dim, r, c, pblk = 2048, 128, 128, 0.3
kb1, kb2 = jax.random.split(jax.random.PRNGKey(dim))
mask = np.asarray(jax.random.bernoulli(kb1, pblk, (dim // r, dim // c)))
tern = np.asarray(rng.rand_ternary(kb2, (dim, dim), non_zero=2))
wd = tern * np.repeat(np.repeat(mask, r, 0), c, 1)
x = rng.rand_dense(kx, (256, dim))
bias = rng.rand_dense(kb, (dim,))
oracle = (
    np.asarray(x, np.float64) @ wd.astype(np.float64)
    + np.asarray(bias, np.float64)
)
prep = bcsr_prepare(bcsr_from_dense(wd.astype(np.float32), r, c))
t(f"bcsr: {prep.k} stored blocks of {dim // r * (dim // c)}")
y = bcsr_spmm_pallas(x, prep, bias)
ok &= check("bcsr f32", y, oracle, 1e-4)
opre = np.where(oracle > 0, oracle, 0.2 * oracle)
ok &= check("bcsr prelu", bcsr_spmm_pallas(x, prep, bias, alpha=0.2), opre, 1e-4)


def fnb(x, prep, bias):
    return bcsr_spmm_pallas(x, prep, bias)


meas = measure_device(fnb, x, prep, bias, reps=3)
t(f"TIME bcsr-packed-scratch 2048^2 @30% blocks M=256 f32: {meas.min_s * 1e6:.2f}us")

xb = x.astype(jnp.bfloat16)
yb = bcsr_spmm_pallas(xb, prep, bias)
ok &= check("bcsr bf16", yb, oracle, 0.35)
meas = measure_device(fnb, xb, prep, bias, reps=3)
t(f"TIME bcsr-packed-scratch 2048^2 @30% blocks M=256 bf16: {meas.min_s * 1e6:.2f}us")

# --- attention decode-vs-full, HIGHEST precision, kernel path ---
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    attention_decode_step,
    attention_forward,
    attention_prefill,
    init_attention,
    init_kv_cache,
    pack_attention,
)

HI = jax.lax.Precision.HIGHEST
cfg = TernaryAttentionConfig(d_model=512, n_heads=8)
params = init_attention(jax.random.PRNGKey(3), cfg)
packed = pack_attention(params, quantize=True)
B, T = 2, 16
xs = rng.rand_dense(kx, (B, T, cfg.d_model)) * 0.1
full = np.asarray(
    attention_forward(packed, xs, cfg, use_kernel=True, precision=HI)
)
cache = init_kv_cache(cfg, B, 32)
y_pre, cache = attention_prefill(
    packed, xs[:, :8], cache, cfg, use_kernel=True, precision=HI
)
outs = [np.asarray(y_pre)]
for step in range(8, T):
    y_t, cache = attention_decode_step(
        packed, xs[:, step : step + 1], cache, cfg,
        use_kernel=True, precision=HI,
    )
    outs.append(np.asarray(y_t))
inc = np.concatenate(outs, axis=1)
err = np.abs(inc - full).max()
t(f"attn decode-vs-full: err={err:.2e} " + ("PASS" if err < 2e-4 else "FAIL"))
ok &= err < 2e-4

t("ALL PASS" if ok else "SOME FAIL")
