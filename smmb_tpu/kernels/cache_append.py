"""Pallas TPU kernel: fused quantize+append for the int8 KV cache.

Why: the int8 cache write in models/attention._cache_write costs ~6 us/layer
more than the bf16 write at decode (round-4 kvq_crossover.txt: int8 GQA2-16k
serves 121.6 vs bf16's 106.6 us/tok e2e while the flash-decode kernel itself
WINS by 5.7 us/layer standalone — verify_flash_decode.txt 20.1 vs 25.8): per step it runs 2 absmax quantizations (XLA
kernels on tiny tensors), 2 scale transposes, and FOUR dynamic_update_slices
(codes k/v + scales k/v) against bf16's two. This kernel does the whole
append in ONE launch: in-kernel absmax per KV head, quantize, and
read-modify-write of the code rows and scale lanes via input/output
aliasing — the cache buffers are updated in place.

Layout notes:
* code rows: int8 cache is (B, S, KVH*hd); the touched block is
  (1, 32, KVH*hd) at sublane row pos%32 (32 = int8 min sublane tile) —
  blended with a sublane-iota select.
* scales: (B, KVH, S) f32; touched block (1, KVH, 128) at lane pos%128 —
  blended with a lane-iota select.
* per-head scale on the flat row: head-of-lane = lane_iota // hd, unrolled
  select over KVH (KVH <= 8 everywhere here) — avoids the sublane->lane
  reshape Mosaic can't do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.kernels._compat import use_interpret

_ROWS = 32  # int8 min sublane tile
_LANES = 128


def _append_kernel(
    pos_ref,
    kf_ref,
    vf_ref,
    kc_in,
    vc_in,
    ks_in,
    vs_in,
    kc_out,
    vc_out,
    ks_out,
    vs_out,
    *,
    kvh: int,
    hd: int,
):
    pos = pos_ref[0]
    row = pos % _ROWS
    lane = pos % _LANES

    def one(new_ref, c_in, c_out, s_in, s_out):
        x = new_ref[0]  # (1, KVD) new token row, compute dtype
        xf = x.astype(jnp.float32)
        # per-head absmax over the flat row: head h owns lanes [h*hd,(h+1)*hd).
        # EXACT mirror of models/attention._quantize_kv: raw absmax/127
        # stored (0 allowed), divide by where(scale>0, scale, 1), round —
        # same ops so codes/scales stay bitwise interchangeable with the
        # dus path
        head_iota = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1) // hd
        scales = []
        for hi in range(kvh):
            m = jnp.max(jnp.where(head_iota == hi, jnp.abs(xf), 0.0))
            scales.append(m / 127.0)
        safe_flat = jnp.ones_like(xf)
        for hi in range(kvh):
            safe = jnp.where(scales[hi] > 0, scales[hi], 1.0)
            safe_flat = jnp.where(head_iota == hi, safe, safe_flat)
        q = jnp.round(xf / safe_flat).astype(jnp.int8)
        # blend the quantized row into the (32, KVD) code block
        blk = c_in[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        c_out[0] = jnp.where(sub == row, jnp.broadcast_to(q, blk.shape), blk)
        # blend the per-head scales into the (KVH, 128) scale block
        sblk = s_in[0]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, sblk.shape, 1)
        svec = jnp.zeros((sblk.shape[0], 1), jnp.float32)
        for hi in range(kvh):
            hsub = jax.lax.broadcasted_iota(jnp.int32, svec.shape, 0)
            svec = jnp.where(hsub == hi, scales[hi], svec)
        s_out[0] = jnp.where(
            lane_iota == lane, jnp.broadcast_to(svec, sblk.shape), sblk
        )

    one(kf_ref, kc_in, kc_out, ks_in, ks_out)
    one(vf_ref, vc_in, vc_out, vs_in, vs_out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_append_quant(
    k_new: jax.Array,  # (B, 1, KVD) compute dtype (flat new token row)
    v_new: jax.Array,
    kc: jax.Array,  # (B, S, KVD) int8 — updated in place (donated)
    vc: jax.Array,
    k_scale: jax.Array,  # (B, KVH, S) f32 — updated in place
    v_scale: jax.Array,
    pos: jax.Array,
    *,
    interpret: bool | None = None,
):
    """One-launch quantize+append of a decode token into the int8 cache.

    Returns (kc, vc, k_scale, v_scale) — the SAME buffers, updated at
    ``pos``: codes row pos gets round(x/scale), scale lane pos gets the
    per-head absmax/127. Codes are bitwise identical to
    models/attention._quantize_kv + dynamic_update_slice; stored scales
    can differ from that path by 1 ulp (XLA sometimes refolds the /127
    into a reciprocal multiply inside the dus fusion) — a ~6e-8 relative
    wobble, far below the int8 cache's ~4e-3 quantization noise.
    """
    b, one_, kvd = k_new.shape
    bs_, s, kvd2 = kc.shape
    bk, kvh, s2 = k_scale.shape
    if one_ != 1 or kvd != kvd2 or bs_ != b or bk != b or s2 != s:
        raise ValueError(
            f"shapes k_new {k_new.shape} kc {kc.shape} k_scale {k_scale.shape}"
        )
    hd = kvd // kvh
    if s % _ROWS or s % _LANES:
        raise ValueError(f"cache length {s} must be a multiple of 128")
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def row_idx(bi, pos_arg):
        p = pos_arg if len(getattr(pos_arg, "shape", ())) == 0 else pos_arg[0]
        return (bi, p // _ROWS, 0)

    def lane_idx(bi, pos_arg):
        p = pos_arg if len(getattr(pos_arg, "shape", ())) == 0 else pos_arg[0]
        return (bi, 0, p // _LANES)

    def new_idx(bi, pos_arg):
        return (bi, 0, 0)

    code_spec = pl.BlockSpec((1, _ROWS, kvd), row_idx, memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, kvh, _LANES), lane_idx, memory_space=pltpu.VMEM
    )
    new_spec = pl.BlockSpec((1, 1, kvd), new_idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_append_kernel, kvh=kvh, hd=hd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                new_spec, new_spec, code_spec, code_spec, scale_spec,
                scale_spec,
            ],
            out_specs=[code_spec, code_spec, scale_spec, scale_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # aliasing: operand index counts the prefetch arg, then inputs in
        # order (pos, k_new, v_new, kc, vc, ks, vs) -> kc is operand 3
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=use_interpret(interpret),
    )(pos_arr, k_new, v_new, kc, vc, k_scale, v_scale)
