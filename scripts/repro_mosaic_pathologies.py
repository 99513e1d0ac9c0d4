"""Minimal repros for the Mosaic/v5e compile pathologies hit in rounds 1-2.

Each case is a small self-contained pallas_call distilled from
smmb_tpu/kernels. The hang cases never return from compilation (observed
>9 min on v5e, 2026-08-17); run them under an external timeout and treat
"still compiling at the timeout" as reproduction. The slowdown case
compiles fine but runs ~2.5x slow.

    timeout 120 python scripts/repro_mosaic_pathologies.py fullk
    timeout 120 python scripts/repro_mosaic_pathologies.py cmp
    timeout 600 python scripts/repro_mosaic_pathologies.py laneslice  # runs
    timeout 600 python scripts/repro_mosaic_pathologies.py segsumloop # faults

Cases
-----
* ``fullk``    — grid with a (256, 4096) f32 x-tile and K folded into one
                 grid step (bk == K == 4096): compile hangs.
                 (packed_spmm with block_k=4096; docs/ROADMAP.md #4)
* ``bigtile``  — bn=1024 with bk=2048 (large N x K tile product): hangs.
* ``cmp``      — int8 bitmask-test + nested-select decode feeding an MXU
                 dot: hangs (the and/!=0/select ops legalize individually —
                 scripts/probe_i8_ops.py — the combination with the dot
                 does not terminate).
* ``laneslice``— slicing a VMEM block on the LANE axis at a dynamic
                 128-aligned offset is fine, but *non*-128 offsets force
                 cross-lane relayouts: compiles, runs ~2.5x slower
                 (measured on the BCSR sub-dot variant, 109us vs 42.8us).

* ``segsumloop``— the XLA gather + segment-sum program (ops/spmm.tcsc_spmm's
                 shape) inside a LONG device-side scan: short loops run
                 fine, loop lengths past ~100-200 iterations fault the dev
                 chip (observed round 2-4; the sweep capped tcsc iters at
                 100 until round 5 rerouted the on-TPU tcsc row to the
                 padded sentinel layout, which loops indefinitely without
                 fault). Expected reproduction: the 64-iter stage prints,
                 the 400-iter stage faults or hangs the backend.

Kept out of the test suite on purpose: these are toolchain repros, not
framework behavior. The production kernels exclude every pathological
configuration (packed_spmm block heuristics; autotune candidate filter).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.time()


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def _mk_dot_kernel(decode):
    def kernel(x_ref, w_ref, o_ref, acc_ref):
        x = x_ref[:]
        wb = w_ref[:]
        if decode == "shift":
            plane = ((wb.astype(jnp.int32) << 30) >> 30).astype(jnp.float32)
        else:  # cmp: bitmask tests + nested select, stays int8 until cast
            presence = (wb & jnp.int8(1)) != 0
            sign = (wb & jnp.int8(2)) != 0
            plane = jnp.where(
                presence,
                jnp.where(sign, jnp.int8(-1), jnp.int8(1)),
                jnp.int8(0),
            ).astype(jnp.float32)
        acc_ref[:] = x @ plane
        o_ref[:] = acc_ref[:]

    return kernel


def run_case(name):
    if name in ("fullk", "bigtile", "cmp"):
        m = 256
        bk = 4096 if name == "fullk" else 2048
        bn = 1024 if name == "bigtile" else 512
        decode = "cmp" if name == "cmp" else "shift"
        if name == "cmp":
            bk, bn = 512, 512
        x = jnp.ones((m, bk), jnp.float32)
        w = jnp.ones((bk, bn), jnp.int8)
        t(f"{name}: compiling grid tile x={x.shape} w={w.shape} "
          f"decode={decode} (hang expected; run under timeout)")
        y = pl.pallas_call(
            _mk_dot_kernel(decode),
            in_specs=[
                pl.BlockSpec((m, bk), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (m, bn), lambda: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((m, bn), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        )(x, w)
        y.block_until_ready()
        t(f"{name}: compiled + ran (NOT reproduced) sum={float(y.sum()):.1f}")
        return

    if name == "segsumloop":
        m, k, n = 64, 1024, 2048
        nnz = k * n // 10
        rs = np.random.RandomState(0)
        idx = jnp.asarray(rs.randint(0, k, size=nnz), jnp.int32)
        seg = jnp.asarray(np.sort(rs.randint(0, n, size=nnz)), jnp.int32)
        x = jnp.asarray(rs.rand(m, k), jnp.float32)

        def spmm(x):
            g = jnp.take(x.T, idx, axis=0)  # (nnz, M)
            return jax.ops.segment_sum(g, seg, num_segments=n)

        def loop(n_iters):
            def body(c, _):
                y = spmm(c)
                live = jnp.sum(jnp.abs(y)).astype(jnp.float32)
                c = jnp.where(live < jnp.inf, c, jnp.zeros_like(c))
                return c, live

            return jax.jit(
                lambda x: jax.lax.scan(body, x, None, length=n_iters)[1][-1]
            )

        for n_it in (16, 64, 400):
            t(f"segsumloop: running {n_it}-iteration device scan ...")
            v = float(loop(n_it)(x))
            t(f"segsumloop: {n_it} iters OK (probe {v:.3e})")
        t("segsumloop: all lengths survived — fault NOT reproduced on this "
          "backend/toolchain")
        return

    assert name == "laneslice"
    # dynamic lane-axis slice of a VMEM block: offset granularity decides
    # whether Mosaic inserts cross-lane relayouts
    m, k, c = 256, 2048, 128

    def kernel(off_ref, x_ref, o_ref, *, step):
        xs = x_ref[:, pl.ds(off_ref[0] * step, c)]
        o_ref[:] = xs * 2.0

    x = jnp.asarray(np.random.rand(m, k), jnp.float32)
    for step, label in ((128, "128-aligned (fast)"), (32, "32-aligned (slow)")):
        import functools

        f = pl.pallas_call(
            functools.partial(kernel, step=step),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (m, c), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
        )
        off = jnp.asarray([4], jnp.int32)
        y = f(off, x)
        y.block_until_ready()
        n_it = 2000
        t0 = time.perf_counter()
        for _ in range(n_it):
            y = f(off, x)
        y.block_until_ready()
        t(f"laneslice {label}: {(time.perf_counter() - t0) / n_it * 1e6:.1f}"
          "us/call (walltime incl dispatch; compare relative only)")


if __name__ == "__main__":
    t(f"backend={jax.default_backend()}")
    for case in sys.argv[1:] or ["laneslice"]:
        run_case(case)
