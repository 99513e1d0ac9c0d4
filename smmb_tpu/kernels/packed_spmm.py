"""Pallas TPU kernel: 2-bit packed ternary SpMM with fused bias + PReLU.

This is the framework's hot path — the TPU-native replacement for every
reference compute kernel (/root/reference/sparse/tcsc.c:69-275 and the AVX
BCSR kernels, /root/reference/sparse/bcsr.c:222-385). Design (SURVEY.md §7
step 3, re-thought for the MXU):

* The reference removes multiplications from a scalar inner loop; on TPU the
  multiplier array is free and the binding resource is HBM bandwidth. So the
  kernel streams the 2-bit ``TernaryPacked`` weight planes (16× smaller than
  the fp32 weights the reference reads), decodes each 128-row plane in VMEM
  with two shift ops (see smmb_tpu/formats/packed.py for the group-strided
  layout that makes the decode gather-free), and issues one MXU dot per
  plane — the decode hides behind the matmul at batch ≥ ~64.
* Grid is (M-tiles, N-tiles, K-tiles) with K innermost; partial products
  accumulate in a VMEM scratch (f32, or int32 in W2A8 mode); bias, dequant
  scale, and the PReLU epilogue apply on the last K step — the reference's
  "on-the-go" variant (/root/reference/sparse/tcsc.c:231-275) is literally
  free here.
* W2A8 serving mode (``compute_dtype=jnp.int8``): activations are per-row
  absmax-quantized to int8, the MXU accumulates in int32, and the epilogue
  dequantizes — halves activation traffic; accuracy budget ~1% of |Y|.
* Pipelining (double-buffered HBM→VMEM tile DMA) comes from the pallas_call
  grid machinery; no hand-rolled DMA needed at this block granularity.

Parity contract: identical math to ``smmb_tpu.ops.packed_spmm_jnp`` (same
decode helper, same accumulation dtype), validated in tests/test_kernels.py
against the dense oracle within the reference tolerance (1e-4, fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.formats.packed import (
    GROUP_ROWS,
    SUB,
    VALUES_PER_BYTE,
    TernaryPacked,
)
from smmb_tpu.kernels._compat import use_interpret
from smmb_tpu.utils.shapes import round_up


def _kernel(*refs, nk, alpha, compute_dtype, decode):
    quant = compute_dtype == jnp.int8
    fold = decode == "fold"
    # fold planes carry a 4^i scale removed in the epilogue ⇒ one
    # accumulator per plane index (int32 shift-combine in int8 mode, f32
    # multiply-combine otherwise — both exact, the scales are powers of
    # two). Round-1 divided the scale out of the *activations* instead for
    # float dtypes; that extra XLA pre-scale op is what cost fold the M=1
    # comparison (6.7 vs 5.2 µs), so every mode is per-plane now.
    per_plane = fold
    scratch = decode == "scratch"
    if scratch:
        refs, wdec_ref = refs[:-1], refs[-1]
    if quant:
        x_ref, w_ref, b_ref, s_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, b_ref, o_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # f32 mode needs HIGHEST precision: the MXU otherwise runs f32 matmuls
    # as single-pass bf16, violating the reference's 1e-4 parity contract.
    # int8 mode rides the double-rate int8 MXU path (int32 accumulation).
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc_t = jnp.int32 if quant else jnp.float32
    # x arrives pre-cast to compute_dtype (wrapper casts once; casting here
    # would repeat per N-tile since the x block only depends on (m, k))
    x = x_ref[:]
    groups = w_ref.shape[0] // SUB
    acc = None if per_plane else acc_ref[:]
    if scratch:
        # decode every plane into a (BK, BN) VMEM scratch (sublane-axis
        # writes), then ONE full-depth MXU dot per grid step. Measured
        # slower than per-plane dots at every shape — the scratch write
        # traffic is K·N·elem bytes per weight pass regardless of M (see
        # the wrapper docstring); kept as a documented design point.
        for gi in range(groups):
            block = w_ref[gi * SUB : (gi + 1) * SUB, :].astype(jnp.int32)
            for i in range(VALUES_PER_BYTE):
                base = gi * GROUP_ROWS + i * SUB
                wdec_ref[base : base + SUB, :] = (
                    (block << (30 - 2 * i)) >> 30
                ).astype(wdec_ref.dtype)
        acc = acc + jnp.dot(
            x,
            wdec_ref[:],
            preferred_element_type=acc_t,
            precision=precision,
        )
        groups = 0  # skip the per-plane loop below
    for gi in range(groups):
        wb = w_ref[gi * SUB : (gi + 1) * SUB, :]
        if decode == "cmp":
            # no-shift decode: bitmask tests + selects stay at int8 vreg
            # granularity (4× the elements per op of the int32 path);
            # Mosaic legalizes int8 and/compare but not int8 shifts. The
            # selects also stay int8 — i1 masks cannot relayout to the
            # 16-bit tiling a bf16 select would need — with one int8→dtype
            # convert at the end.
            vals = (jnp.int8(-1), jnp.int8(1), jnp.int8(0))
        elif decode == "shift":
            block = wb.astype(jnp.int32)
        if fold:
            # int16 domain: i16 packs 2 lanes per 32-bit sublane slot —
            # half the lane-ops of the int32 shift decode. Mosaic on v5e
            # legalizes only a subset of i16 vector ops (probed,
            # scripts/probe_i16_ops.py): and/or/xor/add and converts are
            # fine; sub/mul/shifts SIGABRT the compiler. So the decode is
            # xor+and+add only: flip every hi (sign) bit once per group,
            # then the masked 2-bit field is a biased code u·4^i with
            # u = t+1, and adding -2·4^i recovers t·4^i. Sign extension
            # from the i8 load is irrelevant (masks only touch bits 0-7).
            # NOTE an int8-domain fold (4 lanes/slot) is impossible on
            # this toolchain: Mosaic rejects vector add/sub on i8 outright
            # ("Only vector<i16> and vector<i32> are supported" —
            # scripts/probe_i8_ops.py maps the surface: and/or/xor/cmp/
            # select/cvt legalize, add/sub/shift do not), and the masked
            # field is add-free only for the top plane.
            wx = wb.astype(jnp.int16) ^ jnp.int16(0xAA)
        for i in range(VALUES_PER_BYTE):
            # plane i of group gi = logical rows [base, base + SUB);
            # one MXU dot per decoded plane (K=SUB=128) — no concat/copy
            if fold:
                # scale-folded masked decode (2 i16 ops per plane):
                # (wx & 3·4^i) + (-2·4^i) = 4^i · ternary value.
                # The exact power-of-two scale is shifted (int8 mode) or
                # multiplied (float modes) out of the per-plane
                # accumulators in the epilogue, so parity is bit-exact.
                field = wx & jnp.int16(3 << (2 * i))
                plane16 = field + jnp.int16(-(2 << (2 * i)))
                plane = plane16.astype(
                    jnp.int8 if quant else compute_dtype
                )
            elif decode == "cmp":
                # masks wrapped into int8 range (bit 7 ⇒ -128)
                m1 = ((1 << (2 * i)) + 128) % 256 - 128
                m2 = ((2 << (2 * i)) + 128) % 256 - 128
                presence = (wb & jnp.int8(m1)) != 0
                sign = (wb & jnp.int8(m2)) != 0
                plane = jnp.where(
                    presence, jnp.where(sign, vals[0], vals[1]), vals[2]
                ).astype(compute_dtype)
            else:
                # sign-extend bits 2i..2i+1: (w << (30-2i)) >> 30
                plane = ((block << (30 - 2 * i)) >> 30).astype(compute_dtype)
            base = gi * GROUP_ROWS + i * SUB
            dot = jnp.dot(
                x[:, base : base + SUB],
                plane,
                preferred_element_type=acc_t,
                precision=precision,
            )
            if per_plane:
                # per-plane accumulators: scales 4^i divided out once in
                # the epilogue (exact — sums are multiples of 4^i)
                acc_ref[i] += dot
            else:
                acc = acc + dot
    if acc is not None:
        acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        if per_plane and quant:
            r = (
                acc_ref[0]
                + (acc_ref[1] >> 2)
                + (acc_ref[2] >> 4)
                + (acc_ref[3] >> 6)
            ).astype(jnp.float32)
        elif per_plane:
            # f32 multiply-combine: 0.25^i is an exact exponent shift
            r = (
                acc_ref[0]
                + acc_ref[1] * 0.25
                + acc_ref[2] * 0.0625
                + acc_ref[3] * 0.015625
            )
        else:
            r = acc_ref[:].astype(jnp.float32)
        if quant:
            r = r * s_ref[:]  # per-row dequant scale (BM, 1)
        r = r + b_ref[:].astype(jnp.float32)
        if alpha is not None:
            r = jnp.where(r > 0, r, alpha * r)
        o_ref[:] = r.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha",
        "compute_dtype",
        "block_m",
        "block_n",
        "block_k",
        "interpret",
        "decode",
    ),
)
def packed_spmm(
    x: jax.Array,
    w: TernaryPacked,
    b: jax.Array | None = None,
    alpha: float | None = None,
    *,
    compute_dtype=jnp.float32,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    decode: str = "shift",
) -> jax.Array:
    """``Y = prelu(X @ W + B, alpha)`` with 2-bit packed ternary W.

    ``decode`` selects the VPU plane-decode strategy:
      * ``"shift"`` (default) — int32 shift sign-extend decode. Measured
        fastest on v5e at every shape (M=1 bf16 5.2 µs @1024×4096 /
        13.8 µs @4096×4096; M=256 bf16 54.1 µs / int8 50.7 µs —
        scripts/probe_decode.py + verify_r2c.py, 2026-08-17).
      * ``"fold"`` — xor+and+add masked decode in int16 (~half the VPU
        lane-ops of "shift"; int8 would halve again but Mosaic rejects
        vector add/sub on i8 — scripts/probe_i8_ops.py). The 4^i plane
        scale is removed exactly in the epilogue via per-plane
        accumulators (int32 shift-combine in int8 mode, f32
        multiply-combine otherwise) — no activation pre-scale (round 1's
        pre-scale variant is what lost fold the M=1 comparison, 6.7 vs
        5.2 µs). Bit-exact parity with "shift" (all scales are exponent
        shifts). Kept as the fallback for toolchains where int32 shifts
        regress, and as the in-kernel decode style the BCSR block kernel
        reuses.
      * ``"scratch"`` — shift-decode every plane into a (BK, BN) VMEM
        scratch, then one full-depth MXU dot per grid step instead of one
        short dot per plane. Built to attack the per-plane MXU pass
        latency at tiny M, but measured SLOWER everywhere on v5e
        (M=1 4096² bf16 25.1 vs 13.8 µs; headline bf16 60.3 vs 54.1,
        w2a8 55.7 vs 50.7 — verify_r2c.py 2026-08-17): the scratch writes
        K·N·elem bytes of VMEM traffic per full weight pass regardless of
        M (~33 MB at 4096² bf16), which swamps what the fused per-plane
        dots avoid. Kept as the measured-and-rejected design point.
      * ``"cmp"`` — int8 bitmask tests; interpret-validated but hits a
        pathological multi-minute Mosaic compile on v5e (docs/ROADMAP.md #1).

    Args:
      x: (M, K) activations, float32 or bfloat16.
      w: TernaryPacked weights with logical shape (K, N).
      b: optional (N,) bias (accumulator seed, /root/reference/sparse/tcsc.c:106-110).
      alpha: optional PReLU slope; None = no epilogue activation.
      compute_dtype: MXU input dtype. float32 matches the reference's fp32
        parity contract; bfloat16 doubles MXU throughput (W decodes exactly
        either way — error comes only from casting X).
      block_m/n/k: VMEM tile sizes; None picks a measured heuristic —
        small batches (M<=32, weight-streaming-bound) run best with larger
        1024x1024 K/N tiles (fewer grid steps per byte of weight traffic);
        large compute-bound bf16 batches at wide N / deep K with a
        full-width 4096xN tile and shallow 512-K steps (v5e 2026-08-19:
        50.2us vs 55.6us on the 256x4096x4096 headline); other large
        batches with 512x2048 N/K tiles (v5e sweep, docs/DESIGN.md).
        block_k must be a multiple of 512 (the packed group size).
    Returns:
      (M, N) in x.dtype (leading batch dims of a >2D x are preserved).
    """
    if x.ndim > 2:
        lead = x.shape[:-1]
        y = packed_spmm(
            x.reshape(-1, x.shape[-1]),
            w,
            b,
            alpha,
            compute_dtype=compute_dtype,
            block_m=block_m,
            block_n=block_n,
            block_k=block_k,
            interpret=interpret,
            decode=decode,
        )
        return y.reshape(*lead, y.shape[-1])
    m, k = x.shape
    if block_m is None:
        block_m = 256
    # compute-bound regime at wide N and deep K: a full-width N tile with
    # shallow K steps keeps the y accumulator resident while the decode of
    # the next K slab overlaps the current dot (v5e probes 2026-08-19,
    # 256x4096x4096: bf16 bn4096/bk512 50.2us vs bn512/bk2048 55.6us
    # [scripts/probe_r3_tiles.py]; int8 W2A8 32.1us vs 36.6
    # [scripts/probe_w2a8_tiles.py]). bf16/int8 only: the f32
    # scratch+accumulator at these tiles exceeds the 16M VMEM budget
    # (measured 20.53M OOM).
    wide_n = (
        block_n is None
        and block_k is None
        and m > 32
        and w.data.shape[1] >= 4096
        and k >= 2048
        and compute_dtype in (jnp.bfloat16, jnp.int8)
    )
    if block_n is None:
        # weight-streaming regime: wide N-tiles amortize per-dot MXU pass
        # overhead, but only once K is deep enough that decode dominates
        # (v5e probes 2026-08-17: 1x4096x4096 13.7us bn4096 vs 15.1us
        # bn1024; 1x1024x4096 5.9us bn4096 vs 5.2us bn1024)
        if wide_n:
            block_n = 4096
        else:
            block_n = 512 if m > 32 else (4096 if k >= 4096 else 1024)
    if block_k is None:
        # large K-tiles amortize accumulator traffic and interleave decode
        # with the MXU better (v5e sweep: 512->2048 took the headline config
        # from 63us to 54.5us); kept under 4096 — full-K tiles hit a
        # pathological Mosaic compile
        if wide_n:
            block_k = GROUP_ROWS
        else:
            block_k = 4 * GROUP_ROWS if m > 32 else 2 * GROUP_ROWS
    if block_k % GROUP_ROWS:
        raise ValueError(f"block_k={block_k} must be a multiple of {GROUP_ROWS}")
    kp, n = w.data.shape
    kpad = kp * VALUES_PER_BYTE
    if k != w.rows:
        raise ValueError(f"x K dim {k} != weight rows {w.rows}")

    quant = compute_dtype == jnp.int8
    out_dtype = x.dtype
    # min sublane tile: int8 needs 32, bf16 16, f32 8
    sub_min = 32 if quant else (16 if compute_dtype == jnp.bfloat16 else 8)
    bm = min(block_m, round_up(m, sub_min))
    bn = min(block_n, round_up(n, 128))
    bk = min(block_k, kpad)

    mp = round_up(m, bm)
    npad = round_up(n, bn)
    kq = round_up(kpad, bk)

    if quant:
        # W2A8 serving mode: per-row absmax quantization of activations;
        # the kernel dequantizes in the epilogue with the per-row scale.
        scale = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        xq8 = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        xq = jnp.pad(xq8, ((0, mp - m), (0, kq - k)))
        sq = jnp.pad(scale.astype(jnp.float32), ((0, mp - m), (0, 0)))
    else:
        xq = x.astype(compute_dtype)  # cast once, not per N-tile
        if mp != m or kq != k:
            xq = jnp.pad(xq, ((0, mp - m), (0, kq - k)))
        sq = None
    wq = w.data
    bq = jnp.zeros((1, npad), jnp.float32)
    if b is not None:
        bq = bq.at[0, :n].set(b.astype(jnp.float32))
    if npad != n or kq != kpad:
        wq = jnp.pad(wq, ((0, (kq - kpad) // VALUES_PER_BYTE), (0, npad - n)))

    nm, nn, nk = mp // bm, npad // bn, kq // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, s: (i, s), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // VALUES_PER_BYTE, bn),
            lambda i, j, s: (s, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, bn), lambda i, j, s: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [xq, wq, bq]
    if quant:
        in_specs.append(
            pl.BlockSpec((bm, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(sq)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            nk=nk,
            alpha=alpha,
            compute_dtype=compute_dtype,
            decode=decode,
        ),
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, npad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (VALUES_PER_BYTE, bm, bn) if decode == "fold" else (bm, bn),
                jnp.int32 if quant else jnp.float32,
            )
        ]
        + (
            [pltpu.VMEM((bk, bn), jnp.int8 if quant else compute_dtype)]
            if decode == "scratch"
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * npad * kq,
            bytes_accessed=mp * kq * xq.dtype.itemsize
            + kq * npad // VALUES_PER_BYTE
            + mp * npad * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(interpret),
    )(*operands)
    if mp != m or npad != n:
        out = out[:m, :n]
    return out
