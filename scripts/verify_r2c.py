"""Hardware verification of the round-2c kernel changes:

1. ``decode="fold"`` in packed_spmm — reworked to per-plane accumulators
   in every compute dtype (no activation pre-scale; the i16 in-kernel
   decode is unchanged and Mosaic-legal). Also times the scratch decode
   at the headline shape (previously only measured at M<=32).
2. ``x_resident`` mode in bcsr_spmm_pallas — whole (bm, K) x panel in
   VMEM, per-block slice at a 128-aligned dynamic lane offset, killing
   the per-block x re-DMA (docs/ROADMAP.md #5).

Parity vs float64 numpy oracles; timing via measure_device.
"""

import sys
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
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.utils import rng


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def check(name, got, oracle, tol):
    err = np.abs(np.asarray(got, np.float64) - oracle).max()
    t(f"{name}: err={err:.2e} " + ("PASS" if err < tol else "FAIL"))
    return err < tol


which = set(sys.argv[1:]) or {"fold", "bcsr"}
t(f"devices: {jax.devices()}")
kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
ok = True

if "fold" in which:
    # --- fold parity at a small shape (fast compile), all dtypes ---
    M, K, N = 64, 1024, 512
    x = rng.rand_dense(kx, (M, K))
    w = rng.rand_ternary(kw, (K, N), non_zero=2)
    bias = rng.rand_dense(kb, (N,))
    oracle = (
        np.asarray(x, np.float64) @ np.asarray(w, np.float64)
        + np.asarray(bias, np.float64)
    )
    p = pack_ternary(np.asarray(w))
    for dt, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 0.25), (jnp.int8, 0.5)):
        y = packed_spmm(x, p, bias, compute_dtype=dt, decode="fold")
        ok &= check(f"fold {dt.__name__} {M}x{K}x{N}", y, oracle, tol)

    # --- fold timing vs shift at the two regimes that matter ---
    for (M, K, N), dt, label in (
        ((1, 1024, 4096), jnp.bfloat16, "M=1 bf16 (shift=5.2us)"),
        ((256, 4096, 4096), jnp.bfloat16, "headline bf16 (shift=54.1us)"),
        ((256, 4096, 4096), jnp.int8, "headline w2a8 (shift=50.7us)"),
    ):
        x = rng.rand_dense(kx, (M, K))
        w = rng.rand_ternary(kw, (K, N), non_zero=10)
        bias = rng.rand_dense(kb, (N,))
        p = pack_ternary(np.asarray(w))

        def f8(x, data, bias, _p=p, _dt=dt, _K=K, _N=N):
            from smmb_tpu.formats.packed import TernaryPacked

            w_ = TernaryPacked(data=data, rows=_K, cols=_N, nnz=_p.nnz)
            return packed_spmm(x, w_, bias, compute_dtype=_dt, decode="fold")

        meas = measure_device(f8, x, p.data, bias, reps=3)
        t(f"TIME fold {label} {M}x{K}x{N}: {meas.min_s * 1e6:.2f}us")

    # --- scratch vs shift at deep-K M=1 (the per-plane MXU pass latency
    # gap ROADMAP #1 attributes the 4096x4096 deficit to) ---
    M, K, N = 1, 4096, 4096
    x = rng.rand_dense(kx, (M, K))
    w = rng.rand_ternary(kw, (K, N), non_zero=10)
    bias = rng.rand_dense(kb, (N,))
    p = pack_ternary(np.asarray(w))
    om1 = (
        np.asarray(x, np.float64) @ np.asarray(w, np.float64)
        + np.asarray(bias, np.float64)
    )
    for dec, label in (("shift", "shift"), ("scratch", "scratch")):

        def fm1(x, data, bias, _p=p, _dec=dec):
            from smmb_tpu.formats.packed import TernaryPacked

            w_ = TernaryPacked(data=data, rows=4096, cols=4096, nnz=_p.nnz)
            return packed_spmm(
                x, w_, bias, compute_dtype=jnp.bfloat16, decode=_dec
            )

        ok &= check(f"{label} M=1 bf16 parity", fm1(x, p.data, bias), om1, 0.5)
        meas = measure_device(fm1, x, p.data, bias, reps=3)
        t(f"TIME {label} M=1 4096x4096 bf16 (r1 shift=13.7us, "
          f"2bit-roofline~5.2us): {meas.min_s * 1e6:.2f}us")

    # --- scratch decode at the headline shape (only ever timed at M<=32;
    # its one full-depth dot may beat 8 per-plane K=128 dots here too) ---
    M, K, N = 256, 4096, 4096
    x = rng.rand_dense(kx, (M, K))
    w = rng.rand_ternary(kw, (K, N), non_zero=10)
    bias = rng.rand_dense(kb, (N,))
    p = pack_ternary(np.asarray(w))

    def fsc(x, data, bias, _p=p):
        from smmb_tpu.formats.packed import TernaryPacked

        w_ = TernaryPacked(data=data, rows=K, cols=N, nnz=_p.nnz)
        return packed_spmm(
            x, w_, bias, compute_dtype=jnp.bfloat16, decode="scratch"
        )

    meas = measure_device(fsc, x, p.data, bias, reps=3)
    t(f"TIME scratch headline bf16 (shift=54.1us): {meas.min_s * 1e6:.2f}us")

    def fsq(x, data, bias, _p=p):
        from smmb_tpu.formats.packed import TernaryPacked

        w_ = TernaryPacked(data=data, rows=K, cols=N, nnz=_p.nnz)
        return packed_spmm(
            x, w_, bias, compute_dtype=jnp.int8, decode="scratch"
        )

    meas = measure_device(fsq, x, p.data, bias, reps=3)
    t(f"TIME scratch headline w2a8 (shift=50.7us): {meas.min_s * 1e6:.2f}us")

if "bcsr" in which:
    # --- x_resident BCSR: parity + timing vs the per-block-DMA baseline ---
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
    t(f"bcsr: {prep.k} stored blocks")
    y = bcsr_spmm_pallas(x, prep, bias, x_resident=True)
    ok &= check("bcsr x_res f32", y, oracle, 1e-4)

    for dt, base in ((jnp.float32, 42.8), (jnp.bfloat16, 23.4)):
        xb = x.astype(dt)

        def fb(x, prep, bias):
            return bcsr_spmm_pallas(x, prep, bias, x_resident=True)

        meas = measure_device(fb, xb, prep, bias, reps=3)
        t(
            f"TIME bcsr x_res 2048^2 @30% M=256 {dt.__name__}: "
            f"{meas.min_s * 1e6:.2f}us (per-block-DMA={base}us)"
        )

t("ALL PASS" if ok else "SOME FAILED")
