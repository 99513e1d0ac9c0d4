"""Pallas TPU kernel: single-token decode attention over the KV cache.

Why a dedicated kernel (measured, bench_out/kvq_crossover.txt 2026-08-19):
the jnp decode path feeds the cache through einsums, and XLA never fuses
elementwise producers into a dot — so the int8 cache was DEQUANTIZED TO A
FULL-SIZE f32 TENSOR every step (int8 got *slower* with context: 1.73×
at ctx 2k → 3.21× at 16k GQA vs the bf16 cache), and bf16 MHA decode ran
at 2.3× its HBM traffic floor. This kernel streams cache tiles through
VMEM once, so HBM traffic per step is exactly the live cache bytes (int8
codes when quantized — the 2× read saving finally realized).

Design notes (TPU-first):

* Grid is ``(B, KVH, s_tiles)`` with the cache axis innermost; the online
  softmax carry (m, l, acc) lives in VMEM scratch; output writes once on
  the last tile. The cache is stored FLAT — (B, S, KVH·hd) — and each
  head's (bs, hd) tile is picked by the lane-axis block index: no copy,
  no transpose, Mosaic-legal blocks. The flat layout is load-bearing
  twice over: (a) a reshape of the scan-carried cache feeding a custom
  call materializes a cache-sized copy EVERY step (measured +30 µs at
  ctx 8k), and (b) blocking a 4D (B, S, KVH, hd) cache per head violates
  Mosaic's last-two-dims rule, while all-heads 4D tiles force a
  sublane-strided in-VMEM per-head slice (measured 8× slower). jnp
  consumers reshape the flat cache to heads for their einsums — XLA
  fuses that view into dots for free; only custom calls don't.
* The live length ``pos`` is a SCALAR-PREFETCH argument: tiles beyond the
  live prefix re-use the previous block index (no DMA) and skip compute,
  so a step at position p costs O(p), not O(max_len). The same clamp
  skips tiles below a sliding window.
* int8 dequantization never touches the (bs, hd) tiles: both per-token
  absmax scales fold into LANE-ALIGNED vector multiplies —
  ``scores *= k_scale[cols]`` after the QK^T dot and ``p *= v_scale[cols]``
  before the p·V dot (the scales arrive pre-transposed to (B, KVH, S), a
  few hundred KB). The codes convert to the compute dtype in VMEM, one
  tile at a time.
* Only the boundary tile (the one containing ``pos``, or straddling the
  window's lower edge) pays the iota/compare/where mask; interior tiles
  run mask-free (the flash-attention VPU lesson, kernels/flash_attention).
* f32 inputs run both dots at HIGHEST precision (MXU would silently
  demote to bf16 — the round-2 flash parity failure mode).

The jnp path (models/attention._decode_attention_math) remains the parity
oracle and the fallback for ragged ``valid`` masks and hd % 128 != 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.kernels._compat import use_interpret

_NEG = -1e30
_LOG2E = 1.4426950408889634  # softmax runs in base 2 (see flash_attention)
_VMEM_BUDGET = 14 << 20  # scoped VMEM is ~16 MB; leave headroom


def _fixed_vmem_bytes(rows_all: int, hd: int, compute_itemsize: int) -> int:
    """VMEM bytes that do NOT shrink with the cache tile: the q block, the
    output block, and the three f32 online-softmax scratch buffers — all
    (rows_all, ·) where rows_all = H·nq grows with the chunk size."""
    q_out = 2 * rows_all * hd * compute_itemsize
    scratch = rows_all * (128 * 2 + hd) * 4
    return q_out + scratch


def flash_chunk_rows_ok(
    c: int,
    h: int,
    hd: int,
    kvd: int,
    cache_itemsize: int,
    compute_itemsize: int = 4,
) -> bool:
    """Can a C-token chunk's row-dependent buffers fit VMEM alongside the
    minimum (256-row) double-buffered cache tile pair? The extend/verify
    gate (models/attention.attention_extend_core) calls this so oversized
    chunks fall back to the jnp path instead of OOMing the kernel
    (ADVICE r4: the bs shrink alone cannot reduce rows_all)."""
    return (
        _fixed_vmem_bytes(h * c, hd, compute_itemsize)
        + 4 * 256 * kvd * cache_itemsize
        <= _VMEM_BUDGET
    )


def _decode_kernel(
    pos_ref,
    q_ref,
    *rest,
    ns: int,
    window: int | None,
    block_kv: int,
    quant: bool,
    precision,
    compute_dtype,
    nq: int = 1,
    g: int = 1,
    kvh: int = 1,
    hd: int = 128,
):
    """Online-softmax decode/verify over the cache's s-tiles, ALL KV heads
    per grid step.

    Grid is (B, s_tiles): each step DMAs one fully-contiguous
    (bs, KVH·hd) row-range of the flat cache and loops the KV heads
    in-kernel over static lane slices. Rationale (traced, round 4,
    scripts/probe_int8_step.py): the round-3 (B, KVH, s_tiles) grid was
    GRID-OVERHEAD-BOUND at decode — 72 steps × ~0.6 µs ≈ 43 µs/layer at
    ctx 8k MHA, swamping the 10-20 µs of cache DMA and erasing the int8
    kernel's 2× read saving inside the LM (53.8 int8 vs 52.6 bf16 µs
    in-scan). Folding the head loop into the kernel cuts grid steps by
    KVH× and makes every DMA contiguous.

    ``nq`` query TOKENS per head-block (C of a verify/extend chunk; 1 for
    plain decode): rows are ordered (kv_head, token, group) and row r of a
    head's block is token r // g at position ``pos + r // g`` — the
    per-row causal mask on boundary tiles. Each head's dot has the same
    (nq·g, bs) shape whether nq is 1 or C, and MXU rows are independent,
    so the C=1 step and the C=k+1 verify stay bitwise row-identical — the
    property speculative decoding's losslessness rests on
    (models/spec_decode.py; asserted on hardware in tests and
    scripts/bench_spec_win.py).
    """
    if quant:
        # merged int8 cache: ONE code buffer with per-head [k|v] lane
        # interleave and ONE (2·KVH, bs) scale tile (models/attention.
        # init_kv_cache round-5 layout) — one contiguous DMA per grid step
        kv_ref, sc_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = rest
    s = pl.program_id(1)
    pos = pos_ref[0]
    rows = nq * g  # per-head row block

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def head_body(hi, masked):
        lo, hi_end = hi * rows, (hi + 1) * rows
        q = q_ref[0, lo:hi_end]  # (nq·G, hd) — static sublane slice
        # static lane slice of the contiguous (bs, KVH·hd) tile
        if quant:
            k = kv_ref[0][:, (2 * hi) * hd : (2 * hi + 1) * hd]  # (bs, hd)
        else:
            k = k_ref[0][:, hi * hd : (hi + 1) * hd]  # (bs, hd)
        if k.dtype != compute_dtype:  # int8 codes or mixed-precision cache
            k = k.astype(compute_dtype)
        # (nq·G, bs); the wrapper pre-folds sm_scale*log2(e) into q and the
        # online softmax runs in base 2 — no per-score scale multiply
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if quant:
            # per-token absmax scale, lane-aligned: (1, bs) broadcast.
            # Linear in the score, so it commutes with the log2e factor
            # already folded into q. k scales sit at interleave row 2·hi.
            scores = scores * sc_ref[0, 2 * hi][None, :]
        if masked:
            col = s * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            if nq == 1:
                row_pos = pos
            else:
                # row r is token r // g at global position pos + r // g
                row_pos = pos + (
                    jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // g
                )
            live = col <= row_pos
            if window is not None:
                live = jnp.logical_and(live, col > row_pos - window)
            scores = jnp.where(live, scores, _NEG)

        m_prev = m_ref[lo:hi_end, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        rescale = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(scores - m_new)
        l_ref[lo:hi_end] = jnp.broadcast_to(
            l_ref[lo:hi_end, :1] * rescale
            + jnp.sum(p, axis=-1, keepdims=True),
            (rows, l_ref.shape[1]),
        )
        m_ref[lo:hi_end] = jnp.broadcast_to(m_new, (rows, m_ref.shape[1]))
        if quant:
            v = kv_ref[0][:, (2 * hi + 1) * hd : (2 * hi + 2) * hd]
            p = p * sc_ref[0, 2 * hi + 1][None, :]
        else:
            v = v_ref[0][:, hi * hd : (hi + 1) * hd]  # (bs, hd)
        if v.dtype != compute_dtype:
            v = v.astype(compute_dtype)
        acc_ref[lo:hi_end] = acc_ref[lo:hi_end] * rescale + jnp.dot(
            p.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def body(masked):
        for hi in range(kvh):  # unrolled: static slices, no dynamic strides
            head_body(hi, masked)

    # chunk rows span positions [pos, pos + nq); a tile is live if any
    # row attends into it, and mask-free ("full") only if EVERY (row, col)
    # in it is live — the strictest row is token 0 for the upper edge and
    # token nq-1 for a window's lower edge. nq == 1 reduces to round 3's
    # single-pos conditions exactly.
    last = pos + (nq - 1)
    live_tile = s * block_kv <= last
    full = (s + 1) * block_kv - 1 <= pos
    if window is not None:
        live_tile = jnp.logical_and(
            live_tile, s * block_kv + block_kv - 1 > pos - window
        )
        full = jnp.logical_and(full, s * block_kv > last - window)

    @pl.when(jnp.logical_and(live_tile, full))
    def _():
        body(False)

    @pl.when(jnp.logical_and(live_tile, jnp.logical_not(full)))
    def _():
        body(True)

    @pl.when(s == ns - 1)
    def _():
        l = l_ref[:, :1]
        o_ref[0] = (
            jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)
        ).astype(o_ref.dtype)


def _flash_cache_attention(
    q4: jax.Array,  # (B, nq, H, hd) — nq chunk tokens at pos..pos+nq-1
    kc: jax.Array,  # float (B, S, KVH·hd), or merged int8 (B, S, 2·KVH·hd)
    vc,  # float (B, S, KVH·hd); None in merged-quant mode
    kv_scale,  # (B, 2·KVH, S) f32 interleaved scales; None in float mode
    pos: jax.Array,
    window,
    sm_scale,
    block_kv,  # None = auto tile sizing (≥1 MB per grid step)
    interpret,
    precision,
    compute_dtype,
) -> jax.Array:
    """Shared implementation: nq-token chunk attention over the flat cache.

    Row blocks hold nq·g rows ordered (token, group); row r attends cache
    columns ≤ pos + r//g (window-clipped). nq=1 is the decode step; nq>1
    is the verify/extend chunk — SAME kernel, same tile order, same online
    softmax accumulation, so per-row results are bitwise independent of
    the other rows in the chunk (speculative decoding's losslessness
    contract, models/spec_decode.py).

    Quantized caches arrive MERGED (round 5): one int8 code buffer with
    per-head [k|v] lane interleave plus one (B, 2·KVH, S) scale buffer —
    one contiguous cache DMA per grid step instead of two, and the serving
    scan carries 2 cache buffers instead of 4 (models/attention.
    init_kv_cache rationale; VERDICT r4 #1).
    """
    b, nq, h, hd = q4.shape
    quant = kv_scale is not None
    bk, s_len, width = kc.shape
    if bk != b or (not quant and vc.shape != kc.shape):
        raise ValueError(f"q {q4.shape} vs kc {kc.shape}")
    if hd % 128:
        raise ValueError(f"head_dim {hd} % 128 != 0 — use the jnp path")
    if width % hd:
        raise ValueError(f"cache width {width} not a multiple of hd {hd}")
    kvh = width // (2 * hd) if quant else width // hd
    if kvh < 1 or h % kvh:
        raise ValueError(f"H {h} % KVH {kvh} != 0")
    if quant:
        if vc is not None or kc.dtype != jnp.int8:
            raise ValueError(
                "merged-quant mode takes int8 codes and no separate v"
            )
        if kv_scale.shape != (b, 2 * kvh, s_len):
            raise ValueError(
                f"kv_scale must be (B, 2·KVH, S)=({b}, {2 * kvh}, {s_len}) "
                f"as stored by init_kv_cache, got {kv_scale.shape}"
            )
    if compute_dtype is not None and not jnp.issubdtype(
        jnp.dtype(compute_dtype), jnp.floating
    ):
        # the sm_scale*log2e fold shrinks q by ~10x before the cast; an
        # integer compute_dtype would silently round it to near-zero
        raise ValueError(f"compute_dtype must be floating, got {compute_dtype}")
    g = h // kvh
    if sm_scale is None:
        sm_scale = 1.0 / hd ** 0.5
    if compute_dtype is None:
        compute_dtype = q4.dtype if quant else kc.dtype
    # fold sm_scale AND the exp→exp2 change of base into q once (q is nq
    # tokens — O(B·nq·H·hd)); also lands q in compute_dtype (mixed-dtype
    # dots don't lower on the MXU; cache tiles convert in VMEM)
    q4 = (q4.astype(jnp.float32) * (float(sm_scale) * _LOG2E)).astype(
        compute_dtype
    )

    rows_all = kvh * nq * g  # rows ordered (kv_head, token, group)
    auto_bs = block_kv is None
    if auto_bs:
        block_kv = 1024
    bs = min(block_kv, s_len)
    # all-heads tiles are (bs, KVH·hd): shrink bs so the double-buffered
    # k+v pair (4 tiles) + q/out/scratch stay inside the ~16 MB scoped
    # VMEM limit (f32 kvd=1024 at bs=1024 OOMed at exactly 16.06 MB). The
    # q/out/scratch side is (rows_all, ·) — FIXED in bs — so it joins the
    # budget as a constant and, when it alone exceeds the budget, the call
    # refuses (the chunk gate in models/attention keeps callers off this
    # path; ADVICE r4).
    ci = jnp.dtype(compute_dtype).itemsize
    fixed = _fixed_vmem_bytes(rows_all, hd, ci)
    kv_item = jnp.dtype(kc.dtype).itemsize
    # cache bytes streamed per grid step: 2 float buffers, or 1 merged
    # int8 buffer of double width — identical totals either way
    per_row = width * kv_item * (1 if quant else 2)
    # auto tile sizing: narrow caches (small KVH·hd, or int8's halved
    # bytes) leave a 1024-row tile streaming well under 1 MB per grid
    # step — grid overhead then dominates the read (measured r5, GQA/2
    # int8 ctx8k: 10.4 µs at bs=1024 vs 8.9 at 2048; ctx16k 18.8 → 15.1).
    # Grow the tile until each step moves ≥ 1 MB (VMEM budget permitting).
    if auto_bs:
        while (
            bs < s_len
            and bs * per_row < 1 << 20
            and 4 * bs * per_row + fixed <= _VMEM_BUDGET
        ):
            bs *= 2
    while bs > 256 and (
        bs * per_row > 4 << 20
        or 2 * bs * per_row + fixed > _VMEM_BUDGET
    ):
        bs //= 2
    if 2 * bs * per_row + fixed > _VMEM_BUDGET:
        raise ValueError(
            f"chunk rows {rows_all} (C={nq}, H={kvh * g}) need "
            f"{fixed >> 20} MiB of VMEM scratch — too large for the flash "
            "cache kernel; use the jnp chunk path"
        )
    ns = pl.cdiv(s_len, bs)
    qg = (
        q4.reshape(b, nq, kvh, g, hd)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, rows_all, hd)
    )
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

    def _pos_of(pos_arg):
        # index maps receive the prefetched scalar as a 0-d value on some
        # paths and as the (1,)-shaped SMEM ref on others — unpack by shape
        return pos_arg if len(getattr(pos_arg, "shape", ())) == 0 else pos_arg[0]

    def s_clamp(si, pos_arg):
        # tiles beyond the live prefix (or below the window) re-use the
        # boundary tile's index: no DMA, and the kernel skips compute
        p = _pos_of(pos_arg)
        top = (p + nq - 1) // bs  # the tile holding the chunk's last row
        if window is None:
            return jnp.minimum(si, top)
        # token 0's lower window edge is the lowest column any row reads
        lo = jnp.maximum(0, (p - window + 1) // bs)
        return jnp.clip(si, lo, top)

    def kv_index(bi, si, pos_arg):
        # one contiguous row-range of the flat cache — all heads (and in
        # merged mode both planes) arrive in one DMA; the kernel
        # lane-slices per head
        return (bi, s_clamp(si, pos_arg), 0)

    kv_spec = pl.BlockSpec((1, bs, width), kv_index, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(
            (1, rows_all, hd),
            lambda bi, si, pos_arg: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        kv_spec,
    ]
    inputs = [qg, kc]  # flat caches pass through untouched
    if quant:
        # all heads' interleaved scale rows for the tile: (1, 2·KVH, bs)
        def sc_index(bi, si, pos_arg):
            return (bi, 0, s_clamp(si, pos_arg))

        in_specs.append(
            pl.BlockSpec((1, 2 * kvh, bs), sc_index, memory_space=pltpu.VMEM)
        )
        inputs.append(kv_scale)
    else:
        in_specs.append(kv_spec)
        inputs.append(vc)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            ns=ns,
            window=window,
            block_kv=bs,
            quant=quant,
            precision=precision,
            compute_dtype=compute_dtype,
            nq=nq,
            g=g,
            kvh=kvh,
            hd=hd,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, ns),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, rows_all, hd),
                lambda bi, si, pos_arg: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_all, 128), jnp.float32),
                pltpu.VMEM((rows_all, 128), jnp.float32),
                pltpu.VMEM((rows_all, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_all, hd), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=use_interpret(interpret),
    )(pos_arr, *inputs)
    # (B, KVH·nq·G, hd) → (B, nq, H, hd)
    return (
        out.reshape(b, kvh, nq, g, hd)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, nq, h, hd)
    )


_FLASH_STATICS = (
    "window", "sm_scale", "block_kv", "interpret", "precision",
    "compute_dtype",
)


@functools.partial(jax.jit, static_argnames=_FLASH_STATICS)
def flash_attention_decode(
    q: jax.Array,
    kc: jax.Array,
    vc: jax.Array,
    pos: jax.Array,
    *,
    window: int | None = None,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    precision=None,
    compute_dtype=None,
) -> jax.Array:
    """One-token attention over a static-length float cache, O(pos) HBM
    traffic. (int8 caches go through ``flash_attention_decode_quant``.)

    Args:
      q: (B, H, hd) — the current token's queries. Head ``h`` attends
        cache head ``h // (H // KVH)`` (contiguous grouping, same contract
        as models/attention._chunk_attention_math).
      kc, vc: (B, S, KVH·hd) FLAT cache buffers — the serving layout
        (models/attention.init_kv_cache), read in place, never reshaped.
        KVH is inferred as ``kc.shape[-1] // hd``.
      pos: () or (1,) int32 — the query's own position; cache columns
        ≤ pos are live (the just-written own token included).
      window: sliding window — live columns are (pos−window, pos].
      compute_dtype: dtype of the in-kernel dots (cache tiles convert in
        VMEM — HBM traffic stays at the stored dtype). Default: the cache
        dtype. The serving layer passes its compute_dtype so an
        f32-embedded LM still runs bf16 dots (without this the int8 path
        silently ran f32 HIGHEST — measured 2× kernel time inside the LM,
        docs/PROFILE.md).
    Returns:
      (B, H, hd) in the compute dtype.
    """
    out = _flash_cache_attention(
        q[:, None], kc, vc, None, pos, window, sm_scale,
        block_kv, interpret, precision, compute_dtype,
    )
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=_FLASH_STATICS)
def flash_attention_decode_quant(
    q: jax.Array,
    kv: jax.Array,
    kv_scale: jax.Array,
    pos: jax.Array,
    *,
    window: int | None = None,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    precision=None,
    compute_dtype=None,
) -> jax.Array:
    """``flash_attention_decode`` over the MERGED int8 cache layout:
    ``kv`` (B, S, 2·KVH·hd) codes with per-head [k|v] lane interleave and
    ``kv_scale`` (B, 2·KVH, S) f32 interleaved absmax scales, exactly as
    ``models/attention.init_kv_cache(quantized=True)`` stores them. The
    codes dequantize in VMEM (HBM reads stay int8); one contiguous cache
    DMA per tile. Default compute_dtype is q's dtype. Returns (B, H, hd).
    """
    out = _flash_cache_attention(
        q[:, None], kv, None, kv_scale, pos, window, sm_scale,
        block_kv, interpret, precision, compute_dtype,
    )
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=_FLASH_STATICS)
def flash_attention_chunk(
    q: jax.Array,
    kc: jax.Array,
    vc: jax.Array,
    pos: jax.Array,
    *,
    window: int | None = None,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    precision=None,
    compute_dtype=None,
) -> jax.Array:
    """C-token chunk attention over a static-length float cache
    (extend/verify).

    q: (B, C, H, hd) — C chunk tokens already written to the cache at
    positions pos..pos+C-1; row c attends cache columns ≤ pos + c
    (window-clipped). Same kernel and accumulation order as
    ``flash_attention_decode`` (its C=1 case), so a token's row is
    bitwise identical whether it is decoded alone or inside a verify
    chunk — the property greedy speculative decoding's exactness rests
    on (models/spec_decode.py). Returns (B, C, H, hd) in the compute
    dtype.
    """
    return _flash_cache_attention(
        q, kc, vc, None, pos, window, sm_scale,
        block_kv, interpret, precision, compute_dtype,
    )


@functools.partial(jax.jit, static_argnames=_FLASH_STATICS)
def flash_attention_chunk_quant(
    q: jax.Array,
    kv: jax.Array,
    kv_scale: jax.Array,
    pos: jax.Array,
    *,
    window: int | None = None,
    sm_scale: float | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    precision=None,
    compute_dtype=None,
) -> jax.Array:
    """``flash_attention_chunk`` over the merged int8 cache layout (see
    ``flash_attention_decode_quant``). Returns (B, C, H, hd)."""
    return _flash_cache_attention(
        q, kv, None, kv_scale, pos, window, sm_scale,
        block_kv, interpret, precision, compute_dtype,
    )
