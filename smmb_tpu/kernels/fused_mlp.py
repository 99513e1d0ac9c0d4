"""Pallas TPU kernel: fused two-plane ternary MLP for the decode step.

Why (round-4, VERDICT r3 #7): the short-context LM decode step is
dispatch/grid-overhead-bound, not bandwidth-bound — docs/PROFILE.md traces
the ctx-512 step at 0.34 of its live-prefix byte floor with the time spread
across ~20 small kernel launches (4 packed_spmm + 1 flash-decode per block,
plus XLA glue). At M=1 every plane is weight-streaming-bound, so the two
MLP matmuls can share ONE pallas grid with zero extra HBM traffic:

* grid step ``s`` DMAs the W_up N-tile ``s`` AND the W_down K-slab ``s``
  (the rows of W_down that consume exactly the ``up`` slice this step
  produces — both are 2-bit ``TernaryPacked`` planes, decoded in VMEM with
  the shift decode of kernels/packed_spmm.py);
* ``up_s = prelu(s_up·(x @ Wup_s) + b_up_s, alpha)`` is computed in VMEM
  and immediately consumed by ``acc += up_s @ Wdown_s`` — the (M, d_ff)
  intermediate never exists in HBM, and the epilogue applies
  ``s_down·acc + b_down`` once on the last step.

One launch instead of two, same weight bytes, and the second dot's
activation read comes from registers/VMEM. The reference's analog is the
"on-the-go" PReLU fusion (/root/reference/sparse/tcsc.c:231-275) — here the
whole hidden layer is "on the go".

Parity contract: same plane decode and f32 accumulation as
``packed_spmm``'s "shift" mode; the scalar dequant scales apply POST-dot on
the f32 accumulator (the two-call path scales the activations pre-dot — the
orders are mathematically equal and the post-dot order loses no precision
to the compute-dtype cast). Validated in tests/test_fused_mlp.py against
the two-``packed_spmm_jnp`` composition and the f64 dense oracle.

Scope: float compute dtypes only (the W2A8 path needs a global absmax of
``up`` before the second dot, which a slab-interleaved schedule cannot
know); callers fall back to two ``packed_spmm`` calls otherwise
(models/transformer._mlp_half).
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


def _decode_dot(x, w_ref, acc, compute_dtype, precision):
    """Shift-decode every 128-row plane of a packed ref and accumulate
    ``x @ W`` one MXU dot per plane (same order as packed_spmm's "shift")."""
    groups = w_ref.shape[0] // SUB
    for gi in range(groups):
        block = w_ref[gi * SUB : (gi + 1) * SUB, :].astype(jnp.int32)
        for i in range(VALUES_PER_BYTE):
            plane = ((block << (30 - 2 * i)) >> 30).astype(compute_dtype)
            base = gi * GROUP_ROWS + i * SUB
            acc = acc + jnp.dot(
                x[:, base : base + SUB],
                plane,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
    return acc


def _kernel(
    x_ref,
    wu_ref,
    bu_ref,
    wd_ref,
    bd_ref,
    sc_ref,
    o_ref,
    acc_ref,
    *,
    ns: int,
    alpha: float,
    compute_dtype,
    precision,
):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dot 1: full-depth up slice for this N-tile
    up = _decode_dot(
        x_ref[:],
        wu_ref,
        jnp.zeros((x_ref.shape[0], wu_ref.shape[1]), jnp.float32),
        compute_dtype,
        precision,
    )
    up = up * sc_ref[0] + bu_ref[:].astype(jnp.float32)
    up = jnp.where(up > 0, up, alpha * up)
    # dot 2: this up slice feeds exactly the matching W_down K-slab
    acc_ref[:] = _decode_dot(
        up.astype(compute_dtype), wd_ref, acc_ref[:], compute_dtype, precision
    )

    @pl.when(s == ns - 1)
    def _():
        o_ref[:] = (
            acc_ref[:] * sc_ref[1] + bd_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "compute_dtype", "block_h", "interpret"),
)
def fused_mlp(
    x: jax.Array,
    w_up: TernaryPacked,
    s_up: jax.Array,
    b_up: jax.Array,
    w_down: TernaryPacked,
    s_down: jax.Array,
    b_down: jax.Array,
    *,
    alpha: float,
    compute_dtype=jnp.bfloat16,
    block_h: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """``prelu(s_up·(X @ Wup) + b_up, alpha) @ Wdown · s_down + b_down``
    in one pallas launch. Same math as
    ``packed_spmm(x·s_up, w_up, b_up, alpha)`` then
    ``packed_spmm(up·s_down, w_down, b_down)`` (scalar scales commute with
    the dots; applied post-dot here to keep x unscaled in VMEM).

    Args:
      x: (M, K) activations (float). M is expected small (decode steps);
        large-M prefill should keep using two ``packed_spmm`` calls whose
        compute-bound tile heuristics apply.
      w_up: packed (K, H) plane; w_down: packed (H, K_out).
      s_up, s_down: scalar absmean dequant scales (traced).
      b_up: (H,); b_down: (K_out,).
      block_h: hidden-axis slab width — W_up's N-tile and W_down's K-slab
        (must be a multiple of 512, the packed group size).
    Returns:
      (M, K_out) in x.dtype.
    """
    if jnp.dtype(compute_dtype) not in (jnp.dtype(jnp.float32),
                                        jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"fused_mlp is float-only, got {compute_dtype}")
    m, k = x.shape
    kh, h = w_up.shape
    hd_, kout = w_down.shape
    if kh != k or hd_ != h:
        raise ValueError(f"shape chain {x.shape} @ {w_up.shape} @ {w_down.shape}")
    if k % GROUP_ROWS or h % GROUP_ROWS:
        raise ValueError(
            f"K={k} and H={h} must be multiples of {GROUP_ROWS} "
            "(use two packed_spmm calls otherwise)"
        )
    if block_h % GROUP_ROWS:
        raise ValueError(f"block_h={block_h} % {GROUP_ROWS} != 0")
    bh = min(block_h, h)
    ns = h // bh if h % bh == 0 else -(-h // bh)
    if h % bh:
        raise ValueError(f"H={h} not a multiple of block_h={bh}")

    sub_min = 16 if compute_dtype == jnp.bfloat16 else 8
    mp = round_up(m, sub_min)
    np_ = round_up(kout, 128)
    xq = x.astype(compute_dtype)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
    wuq, wdq = w_up.data, w_down.data
    if np_ != kout:
        wdq = jnp.pad(wdq, ((0, 0), (0, np_ - kout)))
    bu = b_up.astype(jnp.float32).reshape(1, h)
    bd = jnp.zeros((1, np_), jnp.float32).at[0, :kout].set(
        b_down.astype(jnp.float32)
    )
    scales = jnp.stack(
        [jnp.asarray(s_up, jnp.float32), jnp.asarray(s_down, jnp.float32)]
    )

    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            ns=ns,
            alpha=alpha,
            compute_dtype=compute_dtype,
            precision=precision,
        ),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((mp, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k // VALUES_PER_BYTE, bh),
                lambda s: (0, s),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, bh), lambda s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bh // VALUES_PER_BYTE, np_),
                lambda s: (s, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, np_), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (mp, np_), lambda s: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * h * (k + np_),
            bytes_accessed=mp * k * xq.dtype.itemsize
            + k * h // VALUES_PER_BYTE
            + h * np_ // VALUES_PER_BYTE
            + mp * np_ * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(interpret),
    )(xq, wuq, bu, wdq, bd, scales)
    if mp != m or np_ != kout:
        out = out[:m, :kout]
    return out


def _norm_qkv_kernel(
    x_ref,
    g_ref,
    w_ref,
    sc_ref,
    b_ref,
    o_ref,
    *,
    eps: float,
    d: int,
    compute_dtype,
    precision,
):
    # RMSNorm recomputed per N-tile: at decode M the (M, D) norm is a few
    # VPU passes — cheaper than a scratch + first-step sync
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.sum(x * x, axis=-1, keepdims=True) / d
    h = (x * jax.lax.rsqrt(ms + eps) * g_ref[:].astype(jnp.float32)).astype(
        compute_dtype
    )
    acc = _decode_dot(
        h,
        w_ref,
        jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.float32),
        compute_dtype,
        precision,
    )
    o_ref[:] = (acc * sc_ref[:] + b_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "compute_dtype", "block_n", "interpret"),
)
def fused_norm_qkv(
    x: jax.Array,
    norm_g: jax.Array,
    wqkv: TernaryPacked,
    qkv_scale: jax.Array,
    bqkv: jax.Array,
    *,
    eps: float,
    compute_dtype=jnp.bfloat16,
    block_n: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """``rmsnorm(x, norm_g, eps) @ Wqkv · qkv_scale + bqkv`` in one pallas
    launch — the decode step's HEAD companion to ``fused_block_tail``:
    the pre-attention RMSNorm rides the fused QKV projection instead of
    being its own XLA fusion between kernel launches.

    qkv_scale is the per-COLUMN scale vector pack_attention stores (the
    per-matrix scalars broadcast over their column spans); applied
    post-dot like the unfused path. Output dtype follows x (the cache
    write expects it). Same decode/accumulation as packed_spmm "shift".

    Per-row results are independent of other rows (MXU rows, per-row
    norm) — the spec-decode row-identity contract holds here too.
    """
    if jnp.dtype(compute_dtype) not in (jnp.dtype(jnp.float32),
                                        jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"fused_norm_qkv is float-only, got {compute_dtype}")
    m, d = x.shape
    kd, n = wqkv.shape
    if kd != d or norm_g.shape != (d,):
        raise ValueError(f"x {x.shape} / wqkv {wqkv.shape} / g {norm_g.shape}")
    if d % GROUP_ROWS:
        raise ValueError(f"D={d} must be a multiple of {GROUP_ROWS}")
    if n % 128 or qkv_scale.shape != (n,) or bqkv.shape != (n,):
        raise ValueError(f"bad N={n} or scale/bias shapes")
    # largest lane-aligned tile ≤ block_n that divides N (N = D + 2·kv_dim
    # is not always a power of two — e.g. 1536 under GQA)
    bn = min(block_n, n)
    while n % bn:
        bn -= 128

    sub_min = 16 if compute_dtype == jnp.bfloat16 else 8
    mp = round_up(m, sub_min)
    xq = x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0)))
    g2 = norm_g.reshape(1, d)
    sc = qkv_scale.astype(jnp.float32).reshape(1, n)
    bq_ = bqkv.astype(jnp.float32).reshape(1, n)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(
            _norm_qkv_kernel,
            eps=eps,
            d=d,
            compute_dtype=compute_dtype,
            precision=precision,
        ),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((mp, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d // VALUES_PER_BYTE, bn),
                lambda s: (0, s),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, bn), lambda s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda s: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mp, bn), lambda s: (0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * d * n,
            bytes_accessed=mp * d * 4
            + d * n // VALUES_PER_BYTE
            + mp * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(interpret),
    )(xq, g2, wqkv.data, sc, bq_)
    return out[:m] if mp != m else out


def _norm_qkv_quant_kernel(
    x_ref,
    g_ref,
    w_ref,
    sc_ref,
    b_ref,
    oq_ref,
    okv_ref,
    osc_ref,
    *,
    eps: float,
    d: int,
    kvh: int,
    hd: int,
    compute_dtype,
    precision,
):
    """Single grid step: rmsnorm + full QKV dot + int8 K/V quantization in
    the epilogue. The whole packed plane is VMEM-resident (the caller
    gates on its size), so every head's full hd span is visible for the
    per-row absmax."""
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.sum(x * x, axis=-1, keepdims=True) / d
    h = (x * jax.lax.rsqrt(ms + eps) * g_ref[:].astype(jnp.float32)).astype(
        compute_dtype
    )
    acc = _decode_dot(
        h,
        w_ref,
        jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.float32),
        compute_dtype,
        precision,
    )
    y = acc * sc_ref[:] + b_ref[:].astype(jnp.float32)  # (M, d + 2·kvd)
    oq_ref[:] = y[:, :d].astype(oq_ref.dtype)
    kvd = kvh * hd
    # per-(row, head) absmax quantization, identical math to
    # models/attention._quantize_kv; output codes interleave [k_h | v_h]
    # per head (the merged cache layout, init_kv_cache round 5)
    scs = []
    for hi in range(kvh):
        for plane, base in ((0, d + hi * hd), (1, d + kvd + hi * hd)):
            sl = y[:, base : base + hd]  # (M, hd) f32
            scale = jnp.max(jnp.abs(sl), axis=-1, keepdims=True) / 127.0
            safe = jnp.where(scale > 0, scale, 1.0)
            codes = jnp.round(sl / safe).astype(jnp.int8)
            slot = 2 * hi + plane
            okv_ref[:, slot * hd : (slot + 1) * hd] = codes
            scs.append(scale)
    osc_ref[:] = jnp.concatenate(scs, axis=1)  # (M, 2·KVH) f32


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "d_model", "kv_heads", "head_dim", "compute_dtype",
        "interpret",
    ),
)
def fused_norm_qkv_quant(
    x: jax.Array,
    norm_g: jax.Array,
    wqkv: TernaryPacked,
    qkv_scale: jax.Array,
    bqkv: jax.Array,
    *,
    eps: float,
    d_model: int,
    kv_heads: int,
    head_dim: int,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``fused_norm_qkv`` + int8 K/V cache quantization in the SAME launch
    (VERDICT r4 #1): the decode step writes quantized codes directly, with
    no post-hoc quantize fusions between kernels.

    Returns (q (M, d_model) in x.dtype, kv_codes (M, 2·kv_dim) int8 in the
    per-head [k|v] interleave, kv_scales (M, 2·KVH) f32) — exactly the
    shapes ``models/attention._cache_write_quantized`` consumes (after the
    caller's lead-dim reshape). Per-row results are independent of the
    other rows (MXU rows, per-row norm/absmax), preserving the spec-decode
    row-identity contract through the quantized write.

    Runs as ONE grid step with the whole packed plane resident in VMEM —
    callers gate on ``d·N/4`` bytes (models/attention._qkv_quant_fusable).
    """
    if jnp.dtype(compute_dtype) not in (jnp.dtype(jnp.float32),
                                        jnp.dtype(jnp.bfloat16)):
        raise ValueError(
            f"fused_norm_qkv_quant is float-only, got {compute_dtype}"
        )
    m, d = x.shape
    kd, n = wqkv.shape
    kvd = kv_heads * head_dim
    if kd != d or d != d_model or norm_g.shape != (d,):
        raise ValueError(f"x {x.shape} / wqkv {wqkv.shape} / g {norm_g.shape}")
    if n != d + 2 * kvd:
        raise ValueError(f"N={n} != d_model + 2·kv_dim = {d + 2 * kvd}")
    if d % GROUP_ROWS or head_dim % 128:
        raise ValueError(
            f"D={d} % {GROUP_ROWS} or head_dim={head_dim} % 128 != 0"
        )
    if qkv_scale.shape != (n,) or bqkv.shape != (n,):
        raise ValueError(f"bad scale/bias shapes for N={n}")

    sub_min = 16 if compute_dtype == jnp.bfloat16 else 8
    mp = round_up(m, sub_min)
    xq = x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0)))
    g2 = norm_g.reshape(1, d)
    sc = qkv_scale.astype(jnp.float32).reshape(1, n)
    bq_ = bqkv.astype(jnp.float32).reshape(1, n)
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    whole = lambda s: (0, 0)  # noqa: E731 — single-step grid, whole blocks
    q_out, kv_out, sc_out = pl.pallas_call(
        functools.partial(
            _norm_qkv_quant_kernel,
            eps=eps,
            d=d,
            kvh=kv_heads,
            hd=head_dim,
            compute_dtype=compute_dtype,
            precision=precision,
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((mp, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d // VALUES_PER_BYTE, n), whole, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, n), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mp, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, 2 * kvd), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, 2 * kv_heads), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), x.dtype),
            jax.ShapeDtypeStruct((mp, 2 * kvd), jnp.int8),
            jax.ShapeDtypeStruct((mp, 2 * kv_heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * d * n,
            bytes_accessed=mp * d * 4
            + d * n // VALUES_PER_BYTE
            + mp * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(interpret),
    )(xq, g2, wqkv.data, sc, bq_)
    if mp != m:
        q_out, kv_out, sc_out = q_out[:m], kv_out[:m], sc_out[:m]
    return q_out, kv_out, sc_out


def _tail_kernel(
    att_ref,
    x_ref,
    wo_ref,
    bwo_ref,
    g2_ref,
    wu_ref,
    bu_ref,
    wd_ref,
    bd_ref,
    sc_ref,
    o_ref,
    resid_ref,
    h2_ref,
    acc_ref,
    *,
    ns: int,
    alpha: float,
    eps: float,
    d: int,
    compute_dtype,
    precision,
):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        # wo projection + residual + RMSNorm, all rows resident in VMEM
        wo_acc = _decode_dot(
            att_ref[:],
            wo_ref,
            jnp.zeros((att_ref.shape[0], wo_ref.shape[1]), jnp.float32),
            compute_dtype,
            precision,
        )
        resid = (
            x_ref[:].astype(jnp.float32)
            + wo_acc * sc_ref[0]
            + bwo_ref[:].astype(jnp.float32)
        )
        resid_ref[:] = resid
        ms = jnp.sum(resid * resid, axis=-1, keepdims=True) / d
        h2_ref[:] = (
            resid * jax.lax.rsqrt(ms + eps) * g2_ref[:].astype(jnp.float32)
        )
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s > 0)
    def _():
        up = _decode_dot(
            h2_ref[:].astype(compute_dtype),
            wu_ref,
            jnp.zeros((h2_ref.shape[0], wu_ref.shape[1]), jnp.float32),
            compute_dtype,
            precision,
        )
        up = up * sc_ref[1] + bu_ref[:].astype(jnp.float32)
        up = jnp.where(up > 0, up, alpha * up)
        acc_ref[:] = _decode_dot(
            up.astype(compute_dtype), wd_ref, acc_ref[:], compute_dtype,
            precision,
        )

    @pl.when(s == ns)
    def _():
        o_ref[:] = (
            resid_ref[:] + acc_ref[:] * sc_ref[2] + bd_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("alpha", "eps", "compute_dtype", "block_h", "interpret"),
)
def fused_block_tail(
    att: jax.Array,
    x: jax.Array,
    wo: TernaryPacked,
    s_wo: jax.Array,
    b_wo: jax.Array,
    norm2: jax.Array,
    w_up: TernaryPacked,
    s_up: jax.Array,
    b_up: jax.Array,
    w_down: TernaryPacked,
    s_down: jax.Array,
    b_down: jax.Array,
    *,
    alpha: float,
    eps: float,
    compute_dtype=jnp.bfloat16,
    block_h: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """The whole transformer-block TAIL in one pallas launch:

        resid = x + s_wo·(att @ Wo) + b_wo
        h     = rmsnorm(resid, norm2, eps)
        up    = prelu(s_up·(h @ Wup) + b_up, alpha)
        out   = resid + s_down·(up @ Wdown) + b_down

    Grid step 0 runs the ``wo`` projection, residual, and RMSNorm with
    every row resident in VMEM scratch; steps 1..ns stream the MLP slab
    pairs exactly like ``fused_mlp``. Replaces three kernel launches
    (wo/up/down packed_spmm) plus the XLA residual/norm glue with ONE —
    built for the dispatch-bound decode step (docs/PROFILE.md: ctx-512 at
    0.34 of floor; VERDICT r3 #7). Same decode/accumulation scheme as
    ``packed_spmm`` "shift"; scalar scales post-dot (see ``fused_mlp``).

    Per-row results are independent of the other rows in the call (MXU
    rows, per-row norm), so a token decoded alone (M=1) and the same token
    inside a verify chunk (M=C) stay bitwise identical — the speculative-
    decoding contract (models/spec_decode.py) extends through the fused
    tail. Routed by models/transformer.{block_decode_step,block_extend}.

    Args:
      att: (M, A) pre-``wo`` attention mix (attention_decode_core /
        attention_extend_core output, flattened).
      x: (M, D) block input (residual stream).
      s_wo/s_up/s_down: scalar dequant scales (pass 1.0 when unquantized).
    Returns:
      (M, D) in x.dtype.
    """
    if jnp.dtype(compute_dtype) not in (jnp.dtype(jnp.float32),
                                        jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"fused_block_tail is float-only, got {compute_dtype}")
    m, a = att.shape
    mx, dm = x.shape
    if mx != m or wo.shape != (a, dm):
        raise ValueError(f"att {att.shape} / x {x.shape} / wo {wo.shape}")
    kd, h = w_up.shape
    if kd != dm or w_down.shape != (h, dm):
        raise ValueError(
            f"MLP chain {w_up.shape} @ {w_down.shape} vs d_model {dm}"
        )
    if a % GROUP_ROWS or dm % GROUP_ROWS or h % GROUP_ROWS:
        raise ValueError(
            f"A={a}, D={dm}, H={h} must be multiples of {GROUP_ROWS}"
        )
    bh = min(block_h, h)
    if h % bh or bh % GROUP_ROWS:
        raise ValueError(f"H={h} not a multiple of block_h={bh}")
    ns = h // bh

    sub_min = 16 if compute_dtype == jnp.bfloat16 else 8
    mp = round_up(m, sub_min)
    attq = att.astype(compute_dtype)
    xq = x
    if mp != m:
        attq = jnp.pad(attq, ((0, mp - m), (0, 0)))
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
    bwo = b_wo.astype(jnp.float32).reshape(1, dm)
    g2 = norm2.astype(jnp.float32).reshape(1, dm)
    bu = b_up.astype(jnp.float32).reshape(1, h)
    bd = b_down.astype(jnp.float32).reshape(1, dm)
    scales = jnp.stack(
        [
            jnp.asarray(s_wo, jnp.float32),
            jnp.asarray(s_up, jnp.float32),
            jnp.asarray(s_down, jnp.float32),
        ]
    )
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def slab(s):
        return jnp.maximum(s - 1, 0)  # step 0 prefetches slab 0, unused

    out = pl.pallas_call(
        functools.partial(
            _tail_kernel,
            ns=ns,
            alpha=alpha,
            eps=eps,
            d=dm,
            compute_dtype=compute_dtype,
            precision=precision,
        ),
        grid=(1 + ns,),
        in_specs=[
            pl.BlockSpec((mp, a), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, dm), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (a // VALUES_PER_BYTE, dm),
                lambda s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, dm), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dm // VALUES_PER_BYTE, bh),
                lambda s: (0, slab(s)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh), lambda s: (0, slab(s)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bh // VALUES_PER_BYTE, dm),
                lambda s: (slab(s), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, dm), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (mp, dm), lambda s: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, dm), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((mp, dm), jnp.float32),
            pltpu.VMEM((mp, dm), jnp.float32),
            pltpu.VMEM((mp, dm), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * (a * dm + dm * h + h * dm),
            bytes_accessed=mp * (a + 2 * dm) * 4
            + (a * dm + dm * h + h * dm) // VALUES_PER_BYTE,
            transcendentals=0,
        ),
        interpret=use_interpret(interpret),
    )(attq, xq, wo.data, bwo, g2, w_up.data, bu, w_down.data, bd, scales)
    if mp != m:
        out = out[:m]
    return out
