"""Pallas TPU kernel: tiled online-softmax (flash) attention with GQA.

Net-new vs the reference (its workload is MLP-only, SURVEY.md §5); this is
the serving-side companion to the packed SpMM kernel. The jnp attention math
(models/attention.py:_attention_math) materializes the full (B, H, T, T)
score tensor in HBM — O(T²) memory and two full HBM round-trips of scores at
long context. This kernel streams KV tiles through VMEM and carries the
softmax online (running max ``m``, running denominator ``l``, unnormalized
accumulator ``acc``), so scores never leave VMEM and HBM traffic drops to
Q + KV + O.

TPU-first design notes:

* Grid is ``(B·H, q_tiles, kv_tiles)`` with the KV axis innermost
  ("arbitrary"); the (m, l, acc) carry lives in VMEM scratch and the output
  tile is written once on the last KV step.
* Grouped-query attention costs nothing extra: the K/V BlockSpec index maps
  divide the head-grid index by the group factor (``bh // G``), so query
  heads of one group re-use the same KV tile DMA — the cache is never
  materialized at the query head count (the measured-on-chip rule from
  models/attention.py).
* Causal masking clamps the KV-tile index map at the diagonal:
  fully-masked tiles map to the previously fetched block (Pallas skips the
  DMA for an unchanged index) and ``pl.when`` skips their compute, so the
  causal triangle costs ~half the work, not just half the FLOPs.
* Masked lanes use a large-negative finite (-1e30), not -inf: -inf - -inf
  = NaN would poison the running-max rescale on fully masked rows (the
  padded tail of a non-multiple T).
* f32 inputs run BOTH dots (scores and probability·V) at HIGHEST precision
  (same rationale as packed_spmm: the MXU otherwise demotes f32 to
  single-pass bf16 — ~1e-3 error, the round-2 on-chip parity failure). The
  probability·V dot still runs in V's dtype with f32 accumulation, like the
  jnp path's ``probs.astype(v.dtype)``; on the bf16 path DEFAULT precision
  is the native single pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smmb_tpu.kernels._compat import use_interpret
from smmb_tpu.utils.shapes import round_up

_NEG = -1e30  # finite "masked" score: exp2(_NEG - m) underflows to 0
_LOG2E = 1.4426950408889634  # softmax runs in base 2 (see _flash_kernel)


def _flash_kernel(
    *refs,
    ns: int,
    scale: float,
    causal: bool,
    window: int | None,
    block_q: int,
    block_kv: int,
    s_len: int,
    precision,
    diag_mask: bool,
    tri: bool = False,
):
    if tri:
        # triangular grid: the (q-tile, kv-tile) pair for this step comes
        # from scalar-prefetched enumeration arrays — only LIVE tiles are
        # ever stepped (see the wrapper; measured: the rectangular causal
        # grid spent ~0.6 us on every skipped above-diagonal step, ~26% of
        # the kernel at T=4096)
        i_ref, s_ref, q_ref, k_ref, v_ref, *rest = refs
        p = pl.program_id(1)
        i = i_ref[p]
        s = s_ref[p]
    else:
        q_ref, k_ref, v_ref, *rest = refs
        i = pl.program_id(1)
        s = pl.program_id(2)
    if diag_mask:
        dm_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest

    if tri and window is not None:
        # first live tile of row-block i (the window's lower edge)
        row_start = jnp.maximum(0, (i * block_q - window + 1) // block_kv)
    else:
        row_start = 0

    @pl.when(s == row_start)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(masked, use_dm=False):
        # scale*log2(e) folds into the q TILE (BQ·hd elements — 8× fewer
        # VPU ops than scaling the (BQ, BS) scores) and the online softmax
        # runs in base 2 (exp2), killing exp's internal x*log2e multiply
        # too — the kernel is VPU-bound at hd=128 (measured 0.50 of MXU
        # peak before this change, T=4096 causal MHA bf16). Folding in the
        # wrapper instead would cost an HBM round-trip of q per call.
        # Precision note: rounding scale*log2e to a bf16 CONSTANT perturbs
        # the softmax temperature by a systematic ~2^-9 (a bias, not
        # per-element noise); softmax is shift-invariant so only relative
        # score differences see it, and it sits well inside the bf16 test
        # tolerance (0.05) and the kernel's parity artifacts.
        q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
        k = k_ref[0]
        # scores: (BQ, BS) = q @ k^T, f32 accumulation on the MXU
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if use_dm:
            # diagonal tile with block_q == block_kv: every such tile has
            # the SAME row>=col mask, precomputed once outside the kernel
            # and DMA'd once (constant index map) — load+cmp+select is
            # half the VPU passes of the iota chain below
            scores = jnp.where(dm_ref[:] != 0, scores, _NEG)
        elif masked:
            # iota + compare + where are ~4 VPU ops per score element —
            # only boundary tiles (diagonal, window lower edge, s_len
            # tail) pay them; interior tiles take the unmasked body
            # (measured: the masked-everywhere kernel was VPU-bound at
            # 0.22 of MXU peak, T=4096 causal MHA)
            col = s * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            live = col < s_len
            if causal:
                row = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0
                )
                live = jnp.logical_and(live, row >= col)
                if window is not None:
                    # sliding window: row attends (row - window, row]
                    live = jnp.logical_and(live, col > row - window)
            scores = jnp.where(live, scores, _NEG)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        rescale = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(scores - m_new)
        l_new = l_ref[:, :1] * rescale + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0]
        # precision must be threaded here too: on f32 inputs a bare dot
        # demotes to single-pass bf16 on the MXU (~1e-3 error — the exact
        # on-chip parity failure round 2 committed in verify_flash.txt)
        acc_ref[:] = acc_ref[:] * rescale + jnp.dot(
            p.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    # padded tail tiles exist only when S doesn't divide by the KV block
    pad = ns * block_kv > s_len

    if causal:
        # tiles entirely above the diagonal — or entirely below the
        # sliding window — are skipped. Triangular grids never step them
        # (live_tile is construction-true); rectangular grids re-use the
        # fetched block (no DMA) and pl.when skips the compute
        if tri:
            live_tile = jnp.bool_(True)
        else:
            live_tile = s * block_kv <= i * block_q + block_q - 1
            if window is not None:
                live_tile = jnp.logical_and(
                    live_tile,
                    s * block_kv + block_kv - 1 > i * block_q - window,
                )
        # fully-live interior tiles take the unmasked body: below the
        # diagonal, above the window lower edge, clear of the padded tail
        full = i * block_q >= s * block_kv + block_kv - 1
        if window is not None:
            full = jnp.logical_and(
                full, s * block_kv > i * block_q + block_q - 1 - window
            )
        if pad:
            full = jnp.logical_and(full, (s + 1) * block_kv <= s_len)

        @pl.when(jnp.logical_and(live_tile, full))
        def _():
            body(False)

        boundary = jnp.logical_and(live_tile, jnp.logical_not(full))
        if diag_mask:
            # exactly-on-diagonal tiles share one precomputed mask (the
            # wrapper only enables this for block_q == block_kv, causal,
            # no window); a diagonal tile that is ALSO the padded s_len
            # tail keeps the general path
            is_diag = s * block_kv == i * block_q
            if pad:
                is_diag = jnp.logical_and(
                    is_diag, (s + 1) * block_kv <= s_len
                )

            @pl.when(jnp.logical_and(boundary, is_diag))
            def _():
                body(True, use_dm=True)

            @pl.when(jnp.logical_and(boundary, jnp.logical_not(is_diag)))
            def _():
                body(True)

        else:

            @pl.when(boundary)
            def _():
                body(True)

    elif pad:
        is_tail = (s + 1) * block_kv > s_len

        @pl.when(is_tail)
        def _():
            body(True)

        @pl.when(jnp.logical_not(is_tail))
        def _():
            body(False)

    else:
        body(False)

    if tri:
        # last live tile of row-block i: the diagonal tile (clamped to the
        # kv range — the padded-T tail rows point past it)
        row_end = jnp.minimum(
            (i * block_q + block_q - 1) // block_kv, ns - 1
        )
    else:
        row_end = ns - 1

    @pl.when(s == row_end)
    def _():
        l = l_ref[:, :1]
        # l == 0 only on fully masked rows (the padded T tail) — emit 0,
        # the wrapper slices those rows away
        o_ref[0] = jnp.where(
            l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0
        ).astype(o_ref.dtype)


def _flash_kernel_pipe(
    i_ref,
    s_ref,
    sv_ref,
    q_ref,
    k_ref,
    v_ref,
    *rest,
    ns: int,
    scale: float,
    causal: bool,
    window: int | None,
    block_q: int,
    block_kv: int,
    s_len: int,
    precision,
    diag_mask: bool,
):
    """Software-pipelined variant of the triangular causal kernel
    (VERDICT r4 #8's K-tile double-buffered p-scratch): step p computes
    tile s's probabilities into p_buf[p%2] (VPU: exp2/max) while the MXU
    consumes p_buf[1-p%2] — the PREVIOUS tile's probabilities — against
    that tile's V (the v index map trails the k index map by one step).
    The two halves have no data dependence inside a step, giving Mosaic's
    scheduler the chance to overlap MXU and VPU. Each q row gets one extra
    FLUSH step (s=-1) that only drains the last pending p·V and writes the
    output.

    MEASURED AND REJECTED (round 5, v5e): 914.7 µs vs the serial kernel's
    679.5 at T=4096 causal MHA bf16 (frac 0.38 vs 0.51); 3181.5 vs 2320.6
    at T=8192 GQA — outputs bitwise identical, so the loss is pure
    schedule: the (bq, bs) p round-trip through VMEM scratch costs more
    than any MXU/VPU overlap recovers (Mosaic issues the halves in order;
    no cross-step overlap materializes). Kept as the fifth documented
    design point closing the flash-prefill plateau (docs/DESIGN.md
    "Flash prefill occupancy bound")."""
    if diag_mask:
        dm_ref, o_ref, m_ref, l_ref, acc_ref, p_buf = rest
    else:
        o_ref, m_ref, l_ref, acc_ref, p_buf = rest
    p = pl.program_id(1)
    i = i_ref[p]
    s = s_ref[p]
    sv = sv_ref[p]
    par = jax.lax.rem(p, 2)

    comp = s >= 0  # this step computes a new p tile
    acc_ok = sv >= 0  # a pending p·V from the previous step exists
    row_first = jnp.logical_and(comp, jnp.logical_not(acc_ok))

    @pl.when(row_first)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # (1) MXU: drain the pending p_{s-1} @ v_{s-1} (same m basis as acc —
    # both were last rescaled at step p-1)
    @pl.when(acc_ok)
    def _():
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p_buf[1 - par],
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    # (2) VPU: this tile's scores → p into the other scratch buffer
    def compute(masked, use_dm=False):
        q = q_ref[0] * jnp.asarray(scale * _LOG2E, q_ref.dtype)
        scores = jax.lax.dot_general(
            q,
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if use_dm:
            scores = jnp.where(dm_ref[:] != 0, scores, _NEG)
        elif masked:
            col = s * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            live = col < s_len
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            live = jnp.logical_and(live, row >= col)
            if window is not None:
                live = jnp.logical_and(live, col > row - window)
            scores = jnp.where(live, scores, _NEG)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        rescale = jnp.exp2(m_prev - m_new)
        pt = jnp.exp2(scores - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * rescale + jnp.sum(pt, axis=-1, keepdims=True),
            l_ref.shape,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[:] = acc_ref[:] * rescale
        p_buf[par] = pt.astype(p_buf.dtype)

    pad = ns * block_kv > s_len
    full = i * block_q >= s * block_kv + block_kv - 1
    if window is not None:
        full = jnp.logical_and(
            full, s * block_kv > i * block_q + block_q - 1 - window
        )
    if pad:
        full = jnp.logical_and(full, (s + 1) * block_kv <= s_len)

    if diag_mask:
        is_diag = s * block_kv == i * block_q
        if pad:
            is_diag = jnp.logical_and(is_diag, (s + 1) * block_kv <= s_len)

        @pl.when(jnp.logical_and(comp, jnp.logical_and(full, jnp.logical_not(is_diag))))
        def _():
            compute(False)

        @pl.when(jnp.logical_and(comp, is_diag))
        def _():
            compute(True, use_dm=True)

        @pl.when(
            jnp.logical_and(
                comp,
                jnp.logical_and(
                    jnp.logical_not(full), jnp.logical_not(is_diag)
                ),
            )
        )
        def _():
            compute(True)
    else:

        @pl.when(jnp.logical_and(comp, full))
        def _():
            compute(False)

        @pl.when(jnp.logical_and(comp, jnp.logical_not(full)))
        def _():
            compute(True)

    # (3) flush step: pending dot drained above — normalize and emit
    @pl.when(jnp.logical_not(comp))
    def _():
        l = l_ref[:, :1]
        o_ref[0] = jnp.where(
            l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "window",
        "scale",
        "block_q",
        "block_kv",
        "interpret",
        "precision",
        "pipeline_p",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    window: int | None = None,
    scale: float | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    precision=None,
    pipeline_p: bool = False,
) -> jax.Array:
    """Scaled dot-product attention without materializing T×S scores.

    ``pipeline_p`` (causal only): the double-buffered p-scratch variant —
    step s's exp2 (VPU) overlaps step s-1's p·V (MXU); one extra flush
    grid step per q row (see _flash_kernel_pipe).

    Args:
      q: (B, H, T, hd) queries. Head ``h`` attends KV head ``h // (H//KVH)``
        (contiguous grouping, matching models/attention._attention_math).
      k, v: (B, KVH, S, hd) keys/values; ``H % KVH == 0`` (KVH < H is
        grouped-query attention).
      causal: mask position t from attending beyond t (query row i attends
        kv cols ≤ i — prefill semantics, q and kv aligned at position 0).
      window: sliding-window (local) attention — row i attends cols in
        (i−window, i]. Requires causal. Tiles entirely below the window
        skip their DMA and compute, so long-T cost is O(T·window).
      scale: score multiplier; default 1/sqrt(hd).
      block_q / block_kv: VMEM tile sizes along T and S.
    Returns:
      (B, H, T, hd) in q's dtype.
    """
    b, h, t, hd = q.shape
    bk, kvh, s_len, hdk = k.shape
    if (bk, hdk) != (b, hd) or v.shape != k.shape:
        raise ValueError(f"q {q.shape} vs k {k.shape} vs v {v.shape}")
    if h % kvh:
        raise ValueError(f"H {h} % KVH {kvh} != 0")
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if pipeline_p and not causal:
        raise ValueError("pipeline_p is a causal (triangular-grid) variant")
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    g = h // kvh
    if scale is None:
        scale = 1.0 / hd ** 0.5

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    # tuned on v5e at T=4096 causal MHA bf16 (scripts/probe_flash_tiles.py,
    # 2026-08-19): 1024/1024 = 691.6us (0.50 of MXU peak) vs the round-2
    # guesses 256/512 = 1597.6us (0.22) — the Pallas grid is sequential on
    # one core, so larger tiles only amortize per-step VPU/control overhead
    bq = block_q if block_q is not None else min(1024, round_up(t, sub))
    # same default for the window path: narrow KV tiles would skip more
    # masked work but per-step overhead dominates (W=256 T=1024 measured
    # 134us at bkv=256 vs 36us at 1024/1024); at long T the tile skip
    # still bounds live tiles per q-row-block at ~(window+bq)/bs + 1,
    # keeping the O(T·window) cost model
    bs = block_kv if block_kv is not None else min(1024, round_up(s_len, 128))
    tp = round_up(t, bq)
    sp = round_up(s_len, bs)
    hp = round_up(hd, 128)

    qf = q.reshape(b * h, t, hd)
    kf = k.reshape(b * kvh, s_len, hd)
    vf = v.reshape(b * kvh, s_len, hd)
    if (tp, hp) != (t, hd):
        qf = jnp.pad(qf, ((0, 0), (0, tp - t), (0, hp - hd)))
    if (sp, hp) != (s_len, hd):
        kf = jnp.pad(kf, ((0, 0), (0, sp - s_len), (0, hp - hd)))
        vf = jnp.pad(vf, ((0, 0), (0, sp - s_len), (0, hp - hd)))

    nq, ns = tp // bq, sp // bs

    # every exactly-on-diagonal tile shares the row>=col mask when the q
    # and kv tiles are the same size — build it once (XLA, ~2 VPU passes
    # total) and let the constant index map DMA it into VMEM exactly once
    diag_mask = causal and window is None and bq == bs and ns > 1
    if precision is None:
        # f32 inputs would silently demote to single-pass bf16 on the MXU
        precision = (
            jax.lax.Precision.HIGHEST
            if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

    kernel_kw = dict(
        ns=ns,
        scale=scale,
        causal=causal,
        window=window,
        block_q=bq,
        block_kv=bs,
        s_len=s_len,
        precision=precision,
        diag_mask=diag_mask,
    )
    scratch_shapes = [
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, hp), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=(2 if causal else 4) * b * h * tp * sp * hp,
        bytes_accessed=(
            b * h * tp * hp * q.dtype.itemsize
            + 2 * b * kvh * sp * hp * k.dtype.itemsize
            + b * h * tp * hp * q.dtype.itemsize
        ),
        transcendentals=b * h * tp * sp // (2 if causal else 1),
    )
    dm_operand = (
        [
            (
                jax.lax.broadcasted_iota(jnp.int32, (bq, bs), 0)
                >= jax.lax.broadcasted_iota(jnp.int32, (bq, bs), 1)
            ).astype(jnp.int8)
        ]
        if diag_mask
        else []
    )
    out_shape = jax.ShapeDtypeStruct((b * h, tp, hp), q.dtype)

    if causal:
        # TRIANGULAR grid: enumerate only the live (q-tile, kv-tile)
        # pairs (host-side, static) and scalar-prefetch the enumeration.
        # The rectangular causal grid paid a bookkeeping step for every
        # skipped above-diagonal tile — measured ~26% of the kernel at
        # T=4096 MHA bf16 (causal 691 us at 0.25 raw-grid util vs
        # non-causal 1019 us at 0.68 — scripts/probe_flash_vpu.py r4).
        # Ascending s within each row keeps the accumulation order
        # identical to the rectangular grid (bitwise same outputs).
        def _diag(i):
            return min((i * bq + bq - 1) // bs, ns - 1)

        def _lo(i):
            if window is None:
                return 0
            return max(0, (i * bq - window + 1) // bs)

        if pipeline_p:
            # per row: the live tiles (sv trails s by one) + a flush step
            pairs_i, pairs_s, pairs_sv = [], [], []
            for i in range(nq):
                prev = -1
                for si in range(_lo(i), _diag(i) + 1):
                    pairs_i.append(i)
                    pairs_s.append(si)
                    pairs_sv.append(prev)
                    prev = si
                pairs_i.append(i)
                pairs_s.append(-1)  # flush: drain prev p·V, write o
                pairs_sv.append(prev)
            i_arr = jnp.asarray(pairs_i, jnp.int32)
            s_arr = jnp.asarray(pairs_s, jnp.int32)
            sv_arr = jnp.asarray(pairs_sv, jnp.int32)

            def q_index(bh, p, i_ref, s_ref, sv_ref):
                return (bh, i_ref[p], 0)

            def k_index(bh, p, i_ref, s_ref, sv_ref):
                return (bh // g, jnp.maximum(s_ref[p], 0), 0)

            def v_index(bh, p, i_ref, s_ref, sv_ref):
                return (bh // g, jnp.maximum(sv_ref[p], 0), 0)

            in_specs = [
                pl.BlockSpec((1, bq, hp), q_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs, hp), k_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs, hp), v_index, memory_space=pltpu.VMEM),
            ] + (
                [
                    pl.BlockSpec(
                        (bq, bs),
                        lambda bh, p, i_ref, s_ref, sv_ref: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                if diag_mask
                else []
            )
            pipe_kw = dict(kernel_kw)
            out = pl.pallas_call(
                functools.partial(_flash_kernel_pipe, **pipe_kw),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(b * h, len(pairs_i)),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec(
                        (1, bq, hp), q_index, memory_space=pltpu.VMEM
                    ),
                    scratch_shapes=scratch_shapes
                    + [pltpu.VMEM((2, bq, bs), q.dtype)],
                ),
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
                cost_estimate=cost,
                interpret=use_interpret(interpret),
            )(i_arr, s_arr, sv_arr, qf, kf, vf, *dm_operand)
            if (tp, hp) != (t, hd):
                out = out[:, :t, :hd]
            return out.reshape(b, h, t, hd)

        pairs_i, pairs_s = [], []
        for i in range(nq):
            for si in range(_lo(i), _diag(i) + 1):
                pairs_i.append(i)
                pairs_s.append(si)
        i_arr = jnp.asarray(pairs_i, jnp.int32)
        s_arr = jnp.asarray(pairs_s, jnp.int32)

        def q_index(bh, p, i_ref, s_ref):
            return (bh, i_ref[p], 0)

        def kv_index(bh, p, i_ref, s_ref):
            return (bh // g, s_ref[p], 0)

        kv_spec = pl.BlockSpec(
            (1, bs, hp), kv_index, memory_space=pltpu.VMEM
        )
        in_specs = [
            pl.BlockSpec((1, bq, hp), q_index, memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ] + (
            [
                pl.BlockSpec(
                    (bq, bs),
                    lambda bh, p, i_ref, s_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            if diag_mask
            else []
        )
        out = pl.pallas_call(
            functools.partial(_flash_kernel, tri=True, **kernel_kw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b * h, len(pairs_i)),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (1, bq, hp), q_index, memory_space=pltpu.VMEM
                ),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=use_interpret(interpret),
        )(i_arr, s_arr, qf, kf, vf, *dm_operand)
    else:

        def kv_index(bh, i, si):
            return (bh // g, si, 0)

        kv_spec = pl.BlockSpec(
            (1, bs, hp), kv_index, memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_flash_kernel, tri=False, **kernel_kw),
            grid=(b * h, nq, ns),
            in_specs=[
                pl.BlockSpec(
                    (1, bq, hp),
                    lambda bh, i, si: (bh, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                kv_spec,
                kv_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, bq, hp),
                lambda bh, i, si: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=use_interpret(interpret),
        )(qf, kf, vf)
    if (tp, hp) != (t, hd):
        out = out[:, :t, :hd]
    return out.reshape(b, h, t, hd)
