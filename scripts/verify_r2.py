"""Round-2 hardware verification: drive every changed compute path on the
real TPU chip (not interpret mode). Prints PASS/FAIL lines + timings."""

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

import smmb_tpu
from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.bcsr import bcsr_from_dense
from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas
from smmb_tpu.kernels.packed_spmm import packed_spmm
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

# --- packed_spmm: shift + fold decodes, f32/bf16/int8 ---
for (M, K, N) in [(1, 1024, 4096), (256, 4096, 4096)]:
    t(f"gen M={M} K={K} N={N}")
    x = rng.rand_dense(kx, (M, K))
    w = np.asarray(rng.rand_ternary(kw, (K, N), non_zero=2))
    b = rng.rand_dense(kb, (N,))
    t("gen done")
    oracle = (
        np.asarray(x, np.float64) @ w.astype(np.float64)
        + np.asarray(b, np.float64)
    )
    p = smmb_tpu.pack_ternary(w)
    for decode in ("shift", "fold"):
        y = packed_spmm(x, p, b, decode=decode)
        ok &= check(f"M={M} {decode} f32", y, oracle, 1e-4)
        yb = packed_spmm(x, p, b, compute_dtype=jnp.bfloat16, decode=decode)
        ok &= check(f"M={M} {decode} bf16", yb, oracle, 0.35)
        yq = packed_spmm(x, p, b, compute_dtype=jnp.int8, decode=decode)
        # W2A8: per-row absmax int8 activations, ~1% of |Y| budget
        scale = float(np.abs(oracle).max()) * 0.02 + 0.3
        ok &= check(f"M={M} {decode} int8", yq, oracle, scale)

# --- timing: shift vs fold at M=1 (weight-streaming regime) ---
M, K, N = 1, 1024, 4096
x = rng.rand_dense(kx, (M, K))
w = np.asarray(rng.rand_ternary(kw, (K, N), non_zero=2))
b = rng.rand_dense(kb, (N,))
p = smmb_tpu.pack_ternary(w)
for decode in ("shift", "fold"):
    for dt, nm in ((jnp.bfloat16, "bf16"),):
        def fn(x, p, b, _d=decode, _t=dt):
            return packed_spmm(x, p, b, compute_dtype=_t, decode=_d)

        meas = measure_device(fn, x, p, b, reps=3)
        t(f"TIME M=1 1024x4096 {decode} {nm}: {meas.min_s * 1e6:.2f}us")

# --- BCSR 2-bit packed kernel ---
for (dim, r, c, pblk) in [(2048, 128, 128, 0.3)]:  # r%128 req on hardware
    kb1, kb2 = jax.random.split(jax.random.PRNGKey(dim))
    mask = np.asarray(
        jax.random.bernoulli(kb1, pblk, (dim // r, dim // c))
    )
    tern = np.asarray(rng.rand_ternary(kb2, (dim, dim), non_zero=2))
    wd = tern * np.repeat(np.repeat(mask, r, 0), c, 1)
    x = rng.rand_dense(kx, (256, dim))
    bias = rng.rand_dense(kb, (dim,))
    oracle = (
        np.asarray(x, np.float64) @ wd.astype(np.float64)
        + np.asarray(bias, np.float64)
    )
    bc = bcsr_from_dense(wd.astype(np.float32), r, c)
    prep = bcsr_prepare(bc)
    y = bcsr_spmm_pallas(x, prep, bias)
    ok &= check(f"bcsr {dim}x{dim} r{r}c{c} f32", y, oracle, 1e-4)
    yp = bcsr_spmm_pallas(x, prep, bias, alpha=0.2)
    opre = np.where(oracle > 0, oracle, 0.2 * oracle)
    ok &= check(f"bcsr {dim}x{dim} prelu", yp, opre, 1e-4)

def fnb(x, prep, bias):
    return bcsr_spmm_pallas(x, prep, bias)

bc = bcsr_from_dense(
    (np.asarray(rng.rand_ternary(kw, (2048, 2048), non_zero=2))
     * np.repeat(np.repeat(
         np.asarray(jax.random.bernoulli(kx, 0.3, (16, 16))), 128, 0), 128, 1)
     ).astype(np.float32), 128, 128)
prep = bcsr_prepare(bc)
x = rng.rand_dense(kx, (256, 2048))
bias = rng.rand_dense(kb, (2048,))
meas = measure_device(fnb, x, prep, bias, reps=3)
t(f"TIME bcsr-packed 2048^2 @30% blocks M=256: {meas.min_s * 1e6:.2f}us")

# --- attention decode step (KV cache) vs full forward, kernel path ---
from smmb_tpu.models.attention import (
    TernaryAttentionConfig,
    attention_decode_step,
    attention_forward,
    attention_prefill,
    init_attention,
    init_kv_cache,
    pack_attention,
)

cfg = TernaryAttentionConfig(d_model=512, n_heads=8)
params = init_attention(jax.random.PRNGKey(3), cfg)
packed = pack_attention(params, quantize=True)
B, T = 2, 16
xs = rng.rand_dense(kx, (B, T, cfg.d_model)) * 0.1
full = np.asarray(attention_forward(packed, xs, cfg, use_kernel=True))
cache = init_kv_cache(cfg, B, 32)
y_pre, cache = attention_prefill(packed, xs[:, :8], cache, cfg, use_kernel=True)
outs = [np.asarray(y_pre)]
xcur = xs[:, :8]
for step in range(8, T):
    y_t, cache = attention_decode_step(
        packed, xs[:, step : step + 1], cache, cfg, use_kernel=True
    )
    outs.append(np.asarray(y_t))
# causal attention: prefill output cols 0..7 match full forward's first 8
inc = np.concatenate(outs, axis=1)
err = np.abs(inc - full).max()
t(f"attn decode-vs-full: err={err:.2e} " + ("PASS" if err < 2e-4 else "FAIL"))
ok &= err < 2e-4

t("ALL PASS" if ok else "SOME FAIL")
