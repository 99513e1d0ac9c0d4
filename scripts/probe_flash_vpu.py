"""Flash prefill VPU-diet variants (VERDICT r3 #8: 0.52 → ≥0.65 of peak).

The tile sweep (scripts/probe_flash_r4.py, round 4) showed 1024/1024 is
the optimum and bigger tiles LOSE — the kernel is VPU-bound per element,
not per-tile-overhead-bound. This probe measures two ways to shed VPU
passes on the bf16 path, on a minimal standalone copy of the kernel
(causal MHA, T=4096, interior/diag split as shipped):

  V0: shipped scheme (f32 exp2, VPU row-sum for l)           [baseline]
  V1: l via MXU — append a 128-lane ones block to V and read the row sum
      from the p·V dot's first extra lane (kills one full (BQ,BS) VPU
      reduction; l becomes an exact f32 MXU accumulation)
  V2: V1 + exp2 computed in bf16 (p feeds the dot in bf16 anyway; bf16
      vregs pack 2 lanes per slot, halving the exp2+sub pass cost if
      Mosaic vectorizes 2-wide)

Parity for each variant vs the f64 oracle on one head. If a variant
clears ≥0.6 of peak with parity inside the bf16 tolerance, it graduates
into kernels/flash_attention.py behind tests.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_flash_vpu.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.bench.measure import measure_device

_NEG = -1e30
_LOG2E = 1.4426950408889634


def t(m):
    print("[%6.1fs] %s" % (time.time() - T0, m), flush=True)


def _kernel_pipe(q_ref, k_ref, v_ref, dm_ref, o_ref, m_ref, l_ref, acc_ref,
                 sc0_ref, sc1_ref, *, ns, scale, bq, bs):
    """V3: staged software pipeline. Grid runs ns+1 KV steps; step s issues
    the QK^T dot for tile s into a scores scratch while the softmax+pV of
    tile s-1 (read from the OTHER scratch buffer — double-buffered to kill
    the write-after-read hazard; v_ref delivers tile s-1 via its index map)
    runs on the VPU — independent instruction streams Mosaic can overlap.
    The (m, l, acc) update order is identical to V0, so the math (and its
    accumulation order) is unchanged."""
    i = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def qk(ref):
        q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
        ref[:] = jax.lax.dot_general(
            q, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def soft(ref, prev_is_diag):
        scores = ref[:]

        def apply(masked_scores):
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(masked_scores, axis=-1, keepdims=True)
            )
            rescale = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(masked_scores - m_new).astype(v_ref.dtype)
            l_new = l_ref[:, :1] * rescale + jnp.sum(
                p.astype(jnp.float32), axis=-1, keepdims=True
            )
            acc_ref[:] = acc_ref[:] * rescale + jnp.dot(
                p, v_ref[0], preferred_element_type=jnp.float32
            )
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(prev_is_diag)
        def _():
            apply(jnp.where(dm_ref[:] != 0, scores, _NEG))

        @pl.when(jnp.logical_not(prev_is_diag))
        def _():
            apply(scores)

    # tile liveness in q-row block i: live s-tiles are 0..diag where
    # diag = (i*bq + bq - 1) // bs; the grid's last axis runs ns+1 steps
    diag = (i * bq + bq - 1) // bs
    do_qk = jnp.logical_and(s <= diag, s < ns)
    prev_live = jnp.logical_and(s >= 1, s - 1 <= diag)
    prev_is_diag = (s - 1) * bs == i * bq
    even = s % 2 == 0

    @pl.when(jnp.logical_and(do_qk, even))
    def _():
        qk(sc0_ref)

    @pl.when(jnp.logical_and(do_qk, jnp.logical_not(even)))
    def _():
        qk(sc1_ref)

    # s even → previous tile's scores sit in the odd buffer, and vice versa
    @pl.when(jnp.logical_and(prev_live, even))
    def _():
        soft(sc1_ref, prev_is_diag)

    @pl.when(jnp.logical_and(prev_live, jnp.logical_not(even)))
    def _():
        soft(sc0_ref, prev_is_diag)

    @pl.when(s == ns)
    def _():
        l = l_ref[:, :1]
        o_ref[0] = (
            jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)
        ).astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, dm_ref, o_ref, m_ref, l_ref, acc_ref,
            *, ns, scale, bq, bs, variant):
    i = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(use_dm):
        q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
        scores = jax.lax.dot_general(
            q, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if use_dm:
            scores = jnp.where(dm_ref[:] != 0, scores, _NEG)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        rescale = jnp.exp2(m_prev - m_new)
        if variant == 2:
            p = jnp.exp2((scores - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp2(scores - m_new).astype(v_ref.dtype)
        if variant == 0:
            l_new = l_ref[:, :1] * rescale + jnp.sum(
                p.astype(jnp.float32), axis=-1, keepdims=True
            )
            pv = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * rescale + pv
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        else:
            # v_ref carries [V | ones] on the lane axis: lane hd is the
            # row sum of p — l rides the MXU for free
            pv = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * rescale + pv[:, : acc_ref.shape[1]]
            l_new = l_ref[:, :1] * rescale + pv[:, acc_ref.shape[1]:acc_ref.shape[1]+1]
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    live = s * bs <= i * bq + bq - 1
    full = i * bq >= s * bs + bs - 1
    is_diag = s * bs == i * bq

    @pl.when(jnp.logical_and(live, full))
    def _():
        body(False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(full)))
    def _():
        body(True)

    @pl.when(s == ns - 1)
    def _():
        l = l_ref[:, :1]
        o_ref[0] = (
            jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)
        ).astype(o_ref.dtype)


def flash_variant(q, k, v, variant, bq=1024, bs=1024):
    b, h, tt, hd = q.shape
    scale = 1.0 / hd ** 0.5
    nq, ns = tt // bq, tt // bs
    qf = q.reshape(b * h, tt, hd)
    kf = k.reshape(b * h, tt, hd)
    if variant in (0, 3):
        vf = v.reshape(b * h, tt, hd)
        vw = hd
    else:
        ones = jnp.ones((b, h, tt, 128), v.dtype)
        vf = jnp.concatenate([v, ones], -1).reshape(b * h, tt, hd + 128)
        vw = hd + 128
    dm = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, bs), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (bq, bs), 1)
    ).astype(jnp.int8)

    def kv_index(bh, i, si):
        return (bh, jnp.minimum(si, (i * bq + bq - 1) // bs), 0)

    if variant == 3:
        def v_index(bh, i, si):
            return (
                bh,
                jnp.clip(si - 1, 0, (i * bq + bq - 1) // bs),
                0,
            )

        out = pl.pallas_call(
            functools.partial(
                _kernel_pipe, ns=ns, scale=scale, bq=bq, bs=bs
            ),
            grid=(b * h, nq, ns + 1),
            in_specs=[
                pl.BlockSpec((1, bq, hd), lambda bh, i, si: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs, hd), kv_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs, vw), v_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, bs), lambda bh, i, si: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, hd), lambda bh, i, si: (bh, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, tt, hd), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, hd), jnp.float32),
                pltpu.VMEM((bq, bs), jnp.float32),
                pltpu.VMEM((bq, bs), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qf, kf, vf, dm)
        return out.reshape(b, h, tt, hd)

    out = pl.pallas_call(
        functools.partial(
            _kernel, ns=ns, scale=scale, bq=bq, bs=bs, variant=variant
        ),
        grid=(b * h, nq, ns),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bh, i, si: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hd), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, vw), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bs), lambda bh, i, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda bh, i, si: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tt, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, dm)
    return out.reshape(b, h, tt, hd)


B, H, T, HD = 1, 16, 4096, 128
PEAK = 197e12
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (B, H, T, HD), jnp.bfloat16)
k = jax.random.normal(kk, (B, H, T, HD), jnp.bfloat16)
v = jax.random.normal(kv, (B, H, T, HD), jnp.bfloat16)
flops = 4 * B * H * T * T * HD / 2

s = np.asarray(q[0, 0], np.float64) @ np.asarray(k[0, 0], np.float64).T
s /= np.sqrt(HD)
s = np.where(np.tril(np.ones((T, T), bool)), s, -np.inf)
p = np.exp(s - s.max(-1, keepdims=True))
ORC = (p / p.sum(-1, keepdims=True)) @ np.asarray(v[0, 0], np.float64)
OMAX = np.abs(ORC).max()

t(f"devices: {jax.devices()}  SOL {flops/PEAK*1e6:.0f} us")
for variant, bq, bs in ((0, 1024, 1024), (3, 1024, 512), (3, 512, 1024), (3, 512, 512)):
    try:
        fn = jax.jit(functools.partial(flash_variant, variant=variant, bq=bq, bs=bs))
        out = fn(q, k, v)
        rel = np.abs(np.asarray(out[0, 0], np.float64) - ORC).max() / OMAX
        m = measure_device(fn, q, k, v, iters=256, reps=4)
        us = m.min_s * 1e6
        t(f"V{variant} bq={bq} bs={bs}: {us:7.1f} us "
          f"({flops/m.min_s/1e12:5.1f} TF/s, "
          f"{flops/m.min_s/PEAK:.2f} of peak) parity rel={rel:.1e}")
    except Exception as e:
        t(f"V{variant} bq={bq} bs={bs}: FAILED {type(e).__name__}: "
          f"{str(e)[:120]}")
t("DONE")
