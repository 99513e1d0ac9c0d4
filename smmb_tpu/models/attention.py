"""Ternary attention block (net-new model family).

The reference's workload is MLP-only (SURVEY.md §5); serving ternary-weight
transformers additionally needs attention with packed projections. This block
keeps all four projections (Q, K, V, out) in the 2-bit ``TernaryPacked``
format through the Pallas kernel — attention math itself (scores, softmax,
weighted sum) is dense XLA, which is already MXU/fusion-optimal.

Parameter layout mirrors models/mlp.py: dense float ternary masters
(trainable via STE) → ``pack_attention`` → packed serving form.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.formats.packed import concat_packed_cols, pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.models.train import absmean_scale, ternarize_ste
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.utils import rng

# Flash-decode batch gate (measured, scripts/probe_batch_decode.py r4):
# batch 1 always takes the kernel, as does any quantized cache at ANY
# batch — the jnp int8 path re-materializes a dequantized cache every
# step, measured 11-15x slower at b=8 ctx8k (616 vs 6792 us MHA, 84.8 vs
# 1272 GQA/2) with the kernel scaling ~linearly through b=32
# (scripts/probe_quant_batch.py r5, closing ADVICE r4 low #3). For larger
# batches the kernel wins when the cache is big — its O(pos) streaming and
# per-batch grid amortize over real DMA work (b8 MHA ctx1000: kernel 292.2
# vs jnp 349.3 us/step) — but loses in the small-cache regime where XLA's
# fused einsum is already optimal (b8 GQA2 ctx1000, 8 MB cache: kernel
# 116.4 vs jnp 81.1; a batch-resident (s_tiles,) grid variant measured
# 113.0/24.4 standalone — rejected; b8 GQA2 ctx2000, 16.8 MB: kernel 138.3
# vs jnp 116.5). So batch>1 takes the kernel only when the layer's k+v
# buffers exceed FLASH_DECODE_MIN_CACHE_BYTES — 32 MB sits between the
# measured loss at 16.8 MB and the measured win at 32.5 MB (b8 MHA
# ctx1000); past ~33 MB the jnp path stops being comparable anyway (its
# b8 ctx8000 prefill OOMs on a 15.4 GB score tensor; the flash path
# serves it at 384.1 us/step).
FLASH_DECODE_MAX_BATCH = 8
FLASH_DECODE_MIN_CACHE_BYTES = 32 << 20


@dataclasses.dataclass(frozen=True)
class TernaryAttentionConfig:
    d_model: int
    n_heads: int
    causal: bool = True
    non_zero: int = 2  # expected weight density 1/non_zero
    n_kv_heads: int | None = None  # grouped-query attention; None = MHA
    rope: bool = False  # rotary position embeddings on Q/K
    rope_theta: float = 10000.0
    # sliding-window (local) attention: position t attends (t-window, t].
    # None = full causal. Masking-only: the cache stays max_len-sized (the
    # compute win is the point on TPU — scores outside the window never
    # contribute, and the flash kernel skips whole tiles below it).
    window: int | None = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        """KV head count: n_kv_heads < n_heads is grouped-query attention
        (shrinks the KV cache and its decode read traffic by the group
        factor — the standard serving memory trade)."""
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def kv_dim(self) -> int:
        return self.kv_heads * self.head_dim


_PROJS = ("wq", "wk", "wv", "wo")


def apply_rope(
    x: jax.Array, positions: jax.Array, theta: float = 10000.0
) -> jax.Array:
    """Rotary position embeddings (half-split/NeoX pairing).

    x: (B, T, H, hd) with hd even; positions: (T,) global token indices
    (dynamic values are fine — decode passes ``pos + arange``). Rotation
    runs in f32 and casts back, so bf16 serving keeps full-precision
    angles. RoPE is a per-position orthogonal transform of Q and K:
    applied at cache-write time for K, the cached keys need no
    re-rotation at decode (scores depend only on relative offsets)."""
    hd = x.shape[-1]
    if hd % 2:
        raise ValueError(f"RoPE needs an even head_dim, got {hd}")
    half = hd // 2
    inv = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]  # (T, half)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )
    return out.astype(x.dtype)


def _rope_qk(q, k, cfg: TernaryAttentionConfig, positions):
    """Rope flat (B, T, D)/(B, T, kv_dim) projections through the head
    layout and back; no-op when cfg.rope is off."""
    if not cfg.rope:
        return q, k
    b, t, d = q.shape
    hd = cfg.head_dim
    q = apply_rope(
        q.reshape(b, t, cfg.n_heads, hd), positions, cfg.rope_theta
    ).reshape(b, t, d)
    k = apply_rope(
        k.reshape(b, t, cfg.kv_heads, hd), positions, cfg.rope_theta
    ).reshape(b, t, cfg.kv_dim)
    return q, k


def init_attention(key: jax.Array, cfg: TernaryAttentionConfig) -> dict:
    """Ternary projection masters + biases (reference distributions).

    Under GQA (``n_kv_heads < n_heads``) the K/V projections map to
    ``kv_dim`` columns instead of ``d_model``."""
    if cfg.d_model % cfg.n_heads:
        raise ValueError(f"d_model {cfg.d_model} % n_heads {cfg.n_heads}")
    if cfg.n_heads % cfg.kv_heads:
        raise ValueError(
            f"n_heads {cfg.n_heads} % n_kv_heads {cfg.kv_heads} != 0"
        )
    params = {}
    for name in _PROJS:
        key, kw, kb = jax.random.split(key, 3)
        cols = cfg.kv_dim if name in ("wk", "wv") else cfg.d_model
        params[name] = rng.rand_ternary(
            kw, (cfg.d_model, cols), non_zero=cfg.non_zero
        )
        params[name.replace("w", "b")] = rng.rand_dense(kb, (cols,))
    return params


def pack_attention(params: dict, quantize: bool = False) -> dict:
    """Masters → 2-bit packed serving form (biases pass through).

    quantize=True applies the QAT rule (absmean scale × ternarized master,
    matching qat_attention_forward); the scale folds into the activations
    at serve time. quantize=False serves exact ternary masters as-is.
    """
    out = {}
    for name in _PROJS:
        w = params[name]
        if quantize:
            out[name] = pack_ternary_device(ternarize_ste(w))
            out[name + "_scale"] = absmean_scale(w)
        else:
            out[name] = pack_ternary_device(w)
            out[name + "_scale"] = jnp.float32(1.0)
        bname = name.replace("w", "b")
        out[bname] = params[bname]
    # fused [Wq|Wk|Wv] plane: batch-1 decode is weight-streaming-bound, so
    # the three QKV projections run as ONE kernel call per step (one grid
    # launch, one weight pass) — _proj_qkv slices the output. Per-matrix
    # scales become a per-column vector applied post-matmul (s·(x@W) ==
    # (s·x)@W). The TP partitioners rebuild their own dicts and drop these
    # derived entries (parallel/tp_transformer.shard_attn_megatron).
    out["wqkv"] = concat_packed_cols([out["wq"], out["wk"], out["wv"]])
    out["qkv_scale"] = jnp.concatenate(
        [
            jnp.broadcast_to(out[n + "_scale"], (out[n].cols,))
            for n in ("wq", "wk", "wv")
        ]
    )
    out["bqkv"] = jnp.concatenate([out["bq"], out["bk"], out["bv"]])
    return out


def _attention_math(
    q, k, v, cfg: TernaryAttentionConfig, precision=None, use_flash=False,
    valid=None,
):
    """(B, T, D) projections → multi-head scaled dot-product attention.

    Under GQA the query heads are grouped over the (fewer) KV heads with
    grouped einsums — the KV tensors are NEVER materialized at the query
    head count (a broadcast repeat costs a full cache-sized write+read per
    call, more than GQA's read saving; measured on-chip).

    ``use_flash=True`` routes through the Pallas online-softmax kernel
    (kernels/flash_attention.py): identical math, but the (T, T) score
    tensor never touches HBM — the right cost model at long context. The
    jnp einsum path stays the default (and the parity oracle): at short T
    the score tensor fits cache-side and XLA's fusion is already optimal.

    ``precision=None`` keeps the TPU default (single-pass-bf16 MXU inputs,
    f32 accumulation) — the serving configuration. Pass
    ``jax.lax.Precision.HIGHEST`` for bit-tight parity checks (e.g.
    decode-vs-full): at default precision the full and incremental paths
    round differently and diverge at bf16 noise level.

    ``valid``: optional (B, T) bool marking real (non-pad) tokens for
    left-padded ragged batches; pad columns are masked out of every row's
    attention (einsum path only — flash serves aligned batches).
    """
    if valid is not None and use_flash:
        raise ValueError("use_flash does not support ragged (valid) masks")
    b, t, d = q.shape
    h, hd = cfg.n_heads, cfg.head_dim
    kvh = cfg.kv_heads
    g = h // kvh

    # full-sequence path: positions 0..T-1 (prefill-from-empty semantics;
    # chunked continuation goes through attention_extend)
    q, k = _rope_qk(q, k, cfg, jnp.arange(t))

    if use_flash:
        from smmb_tpu.kernels.flash_attention import flash_attention

        qh = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        out = flash_attention(
            qh, kh, vh, causal=cfg.causal, window=cfg.window,
            precision=precision,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, t, d)

    # q: (B, KVH, G, T, hd); k/v: (B, KVH, T, hd)
    q = q.reshape(b, t, kvh, g, hd).transpose(0, 2, 3, 1, 4)
    k = k.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bkgqd,bktd->bkgqt", q, k,
        preferred_element_type=jnp.float32, precision=precision,
    ) / jnp.sqrt(jnp.float32(hd))
    if cfg.causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        if cfg.window is not None:
            # row i attends cols in (i - window, i]
            mask = jnp.logical_and(
                mask, jnp.tril(jnp.ones((t, t), bool), -cfg.window) == 0
            )
        scores = jnp.where(mask, scores, -jnp.inf)
    if valid is not None:
        # pad rows attend only themselves (all-masked rows would NaN the
        # softmax); their outputs are garbage and never read
        pad_ok = jnp.logical_or(
            valid[:, None, :], jnp.eye(t, dtype=bool)[None]
        )  # (B, Tq, Tk)
        scores = jnp.where(
            pad_ok[:, None, None], scores, -jnp.inf
        )
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgqt,bktd->bkgqd", probs, v, precision=precision)
    # (B, KVH, G, T, hd) → (B, T, KVH·G·hd) = (B, T, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, d)


def attention_forward(
    packed: dict,
    x: jax.Array,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    valid=None,
) -> jax.Array:
    """Serving forward: packed projections around dense attention math.

    x: (B, T, d_model). All four projections stream 2-bit planes.
    ``use_flash`` swaps the einsum attention math for the Pallas
    online-softmax kernel (no T×T score tensor in HBM; long-context T).
    ``valid`` (B, T) marks real tokens in a left-padded ragged batch.
    """

    def proj(name, inp):
        return _proj(packed, name, inp, cfg, compute_dtype, use_kernel)

    q = proj("wq", x)
    k = proj("wk", x)
    v = proj("wv", x)
    att = _attention_math(
        q, k, v, cfg, precision=precision, use_flash=use_flash, valid=valid
    )
    return proj("wo", att)


def init_kv_cache(
    cfg: TernaryAttentionConfig,
    batch: int,
    max_len: int,
    dtype=jnp.float32,
    quantized: bool = False,
    ragged: bool = False,
) -> dict:
    """Static-shape KV cache for incremental decode (net-new vs reference;
    serving requirement). ``pos`` counts tokens already written. Under GQA
    the cache holds only ``kv_heads`` heads — group-factor smaller.

    ``quantized=True`` stores int8 codes with a per-token-per-head f32
    absmax scale (the merged ``kv``/``kv_scale`` buffers) — 4×/2× less decode read
    traffic than f32/bf16, which is the long-context decode bottleneck.
    The saving is only realized through the flash-decode kernel
    (``use_flash=True`` decode), which dequantizes tiles in VMEM; the jnp
    einsum path forces XLA to MATERIALIZE a full dequantized cache every
    step (elementwise producers never fuse into a dot), measured 2-3×
    slower than the bf16 cache at long context
    (bench_out/kvq_crossover.txt).

    ``ragged=True`` adds a per-row ``valid`` mask for LEFT-padded ragged
    batches: prefill marks pad slots invalid and every attention read
    masks them. Left padding keeps the write position uniform across rows
    (all rows end at the same buffer index), which is what lets one
    scalar ``pos`` serve a ragged batch."""
    # FLAT storage (B, S, KVH·hd). The layout is load-bearing for the
    # flash-decode kernel: a reshape of a scan-carried cache feeding a
    # custom call materializes a cache-sized copy every step, and a 4D
    # cache cannot be head-blocked under Mosaic's block rules
    # (kernels/flash_decode.py design notes). jnp paths view it back to
    # heads via _cache_kv — XLA fuses that reshape into the attention
    # einsums for free.
    if quantized:
        # MERGED quantized layout (round 5, VERDICT r4 #1): ONE ``kv``
        # code buffer (B, S, 2·KVH·hd) int8 with k/v INTERLEAVED per head
        # ([k_h0 | v_h0 | k_h1 | v_h1 | …] on the lane axis) and ONE
        # ``kv_scale`` buffer (B, 2·KVH, S) with the matching row
        # interleave. Rationale: round 4 traced the int8 cache's residual
        # 6-9 µs/layer end-to-end overhead to DISTRIBUTED step cost — 2
        # extra dynamic_update_slices and 2 extra scan carries vs bf16
        # (docs/ROADMAP.md). Merging k+v codes and packing both scale
        # planes brings the int8 step to bf16's plumbing shape: 2 dus and
        # 3 carried buffers. The per-head interleave (not [all-k | all-v])
        # keeps each head's k/v pair contiguous so TP's head sharding
        # still splits the lane axis on head-pair boundaries. Scales live
        # PRE-TRANSPOSED as (B, 2·KVH, S): the flash kernel wants its
        # per-token scale rows lane-aligned per head, and a per-call
        # transpose is a materialized copy paid every layer every step
        # (round-3 VERDICT #2).
        cache = {
            "kv": jnp.zeros(
                (batch, max_len, 2 * cfg.kv_heads * cfg.head_dim), jnp.int8
            ),
            "kv_scale": jnp.zeros(
                (batch, 2 * cfg.kv_heads, max_len), jnp.float32
            ),
            "pos": jnp.int32(0),
        }
    else:
        shape = (batch, max_len, cfg.kv_heads * cfg.head_dim)
        cache = {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
            "pos": jnp.int32(0),
        }
    if ragged:
        cache["valid"] = jnp.zeros((batch, max_len), bool)
    return cache


def _quantize_kv(x):
    """(…, hd) f32/bf16 → (int8 codes, f32 absmax-scale with hd→1)."""
    scale = jnp.max(
        jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True
    ) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    codes = jnp.round(x.astype(jnp.float32) / safe).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


def _cache_write_quantized(cache: dict, kv_codes, kv_scales, pos, valid=None) -> dict:
    """Append pre-quantized codes/scales to a merged int8 cache: kv_codes
    (B, C, 2·KVH·hd) int8 in the per-head [k|v] interleave, kv_scales
    (B, 2·KVH, C) f32. This is the whole int8 write — 2 dus, matching the
    bf16 path's plumbing (VERDICT r4 #1). The fused norm+QKV epilogue
    (kernels/fused_mlp.fused_norm_qkv_quant) emits these directly."""
    out = dict(cache)
    b, c = kv_codes.shape[:2]
    if "valid" in cache:
        if valid is None:
            valid = jnp.ones((b, c), bool)
        out["valid"] = jax.lax.dynamic_update_slice(
            cache["valid"], valid, (0, pos)
        )
    out["kv"] = jax.lax.dynamic_update_slice(
        cache["kv"], kv_codes.astype(jnp.int8), (0, pos, 0)
    )
    out["kv_scale"] = jax.lax.dynamic_update_slice(
        cache["kv_scale"], kv_scales.astype(jnp.float32), (0, 0, pos)
    )
    out["pos"] = pos + c
    return out


def _cache_write(cache: dict, k, v, pos, valid=None) -> dict:
    """Append (B, C, KVH, hd) k/v at ``pos`` (quantizing if the cache is
    int8) and advance ``pos`` by C. ``valid`` (B, C) marks real tokens for
    ragged caches (defaults to all-real, e.g. decode appends)."""
    b, c = k.shape[:2]
    if "kv" in cache:
        # post-hoc quantize fallback (prefill, rope, unfused paths): build
        # the per-head interleave and write via the merged 2-dus path
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        codes = jnp.stack([kq, vq], axis=3).reshape(b, c, -1)
        scales = (
            jnp.stack([ks[..., 0], vs[..., 0]], axis=3)
            .reshape(b, c, -1)
            .transpose(0, 2, 1)
        )
        return _cache_write_quantized(cache, codes, scales, pos, valid=valid)
    out = dict(cache)
    if "valid" in cache:
        if valid is None:
            valid = jnp.ones((b, c), bool)
        out["valid"] = jax.lax.dynamic_update_slice(
            cache["valid"], valid, (0, pos)
        )
    for name, val in (("k", k.reshape(b, c, -1)), ("v", v.reshape(b, c, -1))):
        out[name] = jax.lax.dynamic_update_slice(
            cache[name], val.astype(cache[name].dtype), (0, pos, 0)
        )
    out["pos"] = pos + k.shape[1]
    return out


def _cache_kv(cache: dict, kv_heads: int):
    """The flat cache's K/V as (B, S, KVH, hd) compute views for the jnp
    einsum paths (the reshape fuses into the downstream dots; dequantized
    view if int8 — note the dequant multiply does NOT fuse into a dot and
    materializes, which is why the serving decode path prefers the
    flash-decode kernel)."""
    if "kv" in cache:
        # merged interleaved layout (init_kv_cache): un-interleave views
        b, s, kvd2 = cache["kv"].shape
        hd = kvd2 // (2 * kv_heads)
        kv = cache["kv"].reshape(b, s, kv_heads, 2, hd).astype(jnp.float32)
        sc = cache["kv_scale"].reshape(b, kv_heads, 2, s)
        ksc = sc[:, :, 0].transpose(0, 2, 1)[..., None]  # (B, S, KVH, 1)
        vsc = sc[:, :, 1].transpose(0, 2, 1)[..., None]
        return kv[:, :, :, 0] * ksc, kv[:, :, :, 1] * vsc
    b, s, kvd = cache["k"].shape
    hd = kvd // kv_heads
    kc = cache["k"].reshape(b, s, kv_heads, hd)
    vc = cache["v"].reshape(b, s, kv_heads, hd)
    return kc, vc


def _cache_code_bytes(cache: dict) -> int:
    """Total k+v code bytes in the cache (the flash-gate size signal)."""
    if "kv" in cache:
        return cache["kv"].size
    return 2 * cache["k"].size * cache["k"].dtype.itemsize


def _split_heads(x, cfg: TernaryAttentionConfig, heads: int | None = None):
    b, t, _ = x.shape
    return x.reshape(b, t, heads or cfg.n_heads, cfg.head_dim)


def _proj(packed, name, inp, cfg, compute_dtype, use_kernel):
    w, b = packed[name], packed[name.replace("w", "b")]
    s = packed.get(name + "_scale")
    raw = inp
    if s is not None:
        inp = inp * s
    if use_kernel:
        y = packed_spmm(inp, w, b, compute_dtype=compute_dtype)
    else:
        y = packed_spmm_jnp(inp, w, b, dtype=compute_dtype)
    lora = packed.get(name + "_lora")
    if lora is not None:
        # low-rank residual on the frozen 2-bit base (models/lora.py):
        # y += scale · (x A) B — the adapter sees the raw layer input
        a, bb, sc = lora
        y = y + jnp.matmul(jnp.matmul(raw, a), bb) * sc
    return y


def _proj_qkv(packed, inp, cfg, compute_dtype, use_kernel):
    """The three QKV projections of a decode/extend step as ONE fused
    kernel call when the packed dict carries the [Wq|Wk|Wv] plane.

    Batch-1 decode is weight-streaming-bound: three separate packed_spmm
    calls pay three grid launches for the same total weight traffic. The
    fused plane (pack_attention) runs one. Scales apply post-matmul as a
    per-column vector (s·(x@W) == (s·x)@W exactly — scales are f32
    scalars broadcast per source matrix); the bias is added after the
    scale, matching _proj's (s·x)@W + b. LoRA-adapted QKV falls back to
    the per-projection path so adapters see their raw layer input."""
    fused = packed.get("wqkv")
    if fused is None or any(
        packed.get(n + "_lora") is not None for n in ("wq", "wk", "wv")
    ):
        return (
            _proj(packed, "wq", inp, cfg, compute_dtype, use_kernel),
            _proj(packed, "wk", inp, cfg, compute_dtype, use_kernel),
            _proj(packed, "wv", inp, cfg, compute_dtype, use_kernel),
        )
    if use_kernel:
        y = packed_spmm(inp, fused, compute_dtype=compute_dtype)
    else:
        y = packed_spmm_jnp(inp, fused, dtype=compute_dtype)
    # scale+bias in f32, cast back: keeps the output dtype identical to
    # the per-projection path (the KV cache write requires it) while the
    # bias adds at full precision like _proj's f32 accumulator seed
    y = (
        y.astype(jnp.float32) * packed["qkv_scale"] + packed["bqkv"]
    ).astype(y.dtype)
    d, kvd = cfg.d_model, cfg.kv_dim
    return y[..., :d], y[..., d : d + kvd], y[..., d + kvd :]


def attention_prefill(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    valid=None,
) -> tuple[jax.Array, dict]:
    """Process a whole prompt (B, T, D): full causal attention (identical to
    ``attention_forward``) plus cache fill. Returns (y, cache).

    ``valid`` (B, T): real-token mask for a left-padded ragged batch
    (requires a ragged cache); pad slots are written but marked invalid."""
    b, t, _ = x.shape
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    k = _split_heads(_proj(packed, "wk", x, cfg, **kw), cfg, cfg.kv_heads)
    v = _split_heads(_proj(packed, "wv", x, cfg, **kw), cfg, cfg.kv_heads)
    if cfg.rope:
        # the cache stores ROPED keys (decode then never re-rotates);
        # positions continue from the cache — attention_forward below
        # ropes at 0..T-1, so whole-prompt prefill assumes an empty cache
        # (chunked continuation goes through attention_extend). Buffer
        # positions serve ragged batches too: left-padding keeps relative
        # offsets between real tokens intact, which is all RoPE sees.
        k = apply_rope(k, cache["pos"] + jnp.arange(t), cfg.rope_theta)
    cache = _cache_write(cache, k, v, cache["pos"], valid=valid)
    y = attention_forward(
        packed, x, cfg, precision=precision, use_flash=use_flash,
        valid=valid, **kw
    )
    return y, cache


def _chunk_attention_math(
    q, kc, vc, pos, head_dim, precision=None, window=None, valid=None
):
    """C-token chunk attention over a static-length cache.

    q: (B, C, H, hd); kc/vc: (B, max_len, KVH, hd) with the chunk already
    written at [pos, pos+C) (KVH < H is grouped-query attention — query
    heads group over the cache heads via grouped einsums; the cache is
    never materialized at H, which would cost a cache-sized write+read per
    call). Query row i attends cache columns ≤ pos+i; scores beyond the
    live prefix are masked — static shapes keep XLA happy (no
    data-dependent slice sizes). Head count is whatever the caller owns
    (shard-local under tensor parallelism). Returns (B, C, H·hd)."""
    b, c = q.shape[:2]
    max_len = kc.shape[1]
    kvh = kc.shape[2]
    g = q.shape[2] // kvh
    qg = q.reshape(b, c, kvh, g, q.shape[3])  # (B, C, KVH, G, hd)
    scores = jnp.einsum(
        "bqkgd,btkd->bkgqt", qg, kc,
        preferred_element_type=jnp.float32, precision=precision,
    ) / jnp.sqrt(jnp.float32(head_dim))
    qpos = pos + jnp.arange(c)[:, None]  # (C, 1) global query positions
    cols = jnp.arange(max_len)[None, :]
    live = cols <= qpos  # (C, max_len), includes each row's own token
    if window is not None:
        live = jnp.logical_and(live, cols > qpos - window)
    live = live[None, None, None]  # (1, 1, 1, C, max_len)
    if valid is not None:
        # ragged batch: pad slots are masked per row (queries here are
        # always real tokens — pads only exist in the prefill region)
        live = jnp.logical_and(live, valid[:, None, None, None, :])
    scores = jnp.where(live, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bkgqt,btkd->bqkgd", probs, vc, precision=precision)
    return out.reshape(b, c, -1)


def _decode_attention_math(
    q, kc, vc, pos, head_dim, precision=None, window=None, valid=None
):
    """One-token attention over a static-length cache — the C=1 case of
    ``_chunk_attention_math``. Returns (B, 1, H·hd)."""
    return _chunk_attention_math(
        q, kc, vc, pos, head_dim, precision, window, valid
    )


def attention_decode_step(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    """One incremental decode step: x_t is (B, 1, D), attends over the cache
    plus itself — O(T·D) instead of the O(T²·D) full-recompute path
    (``attention_forward`` recomputes all T×T scores; fine for prefill,
    wrong cost model for serving decode). Returns (y_t, new_cache).

    ``use_flash=True`` routes the cache read through the Pallas
    flash-decode kernel (kernels/flash_decode.py): cache tiles stream
    through VMEM once (tiles beyond ``pos`` skip DMA + compute), and an
    int8 cache dequantizes in-kernel — the jnp einsum path instead forces
    XLA to materialize a full-size dequantized cache every step (measured
    2-3× slower at long context, bench_out/kvq_crossover.txt). Falls back
    to the jnp path for ragged ``valid`` masks or head_dim % 128 != 0."""
    out, cache = attention_decode_core(
        packed, x_t, cache, cfg,
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    y = _proj(packed, "wo", out, cfg, **kw)
    return y, cache


def _qkv_prenorm_fusable(packed, cfg, compute_dtype, use_kernel):
    """Can the pre-attention RMSNorm ride the fused QKV kernel
    (kernels/fused_mlp.fused_norm_qkv)? Mirrors _proj_qkv's fused-plane
    conditions plus the packed-group alignment the kernel needs."""
    return (
        use_kernel
        and packed.get("wqkv") is not None
        and not any(
            packed.get(n + "_lora") is not None for n in ("wq", "wk", "wv")
        )
        and jnp.dtype(compute_dtype)
        in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        and cfg.d_model % 512 == 0
        and packed["wqkv"].cols % 128 == 0
    )


def _proj_qkv_prenorm(packed, x, cfg, prenorm, compute_dtype):
    """norm1 + fused QKV in ONE kernel launch (decode/extend fast path)."""
    from smmb_tpu.kernels.fused_mlp import fused_norm_qkv

    b = x.shape[0]
    lead = x.shape[:-1]
    y = fused_norm_qkv(
        x.reshape(-1, x.shape[-1]),
        prenorm[0],
        packed["wqkv"],
        packed["qkv_scale"],
        packed["bqkv"],
        eps=prenorm[1],
        compute_dtype=compute_dtype,
    ).reshape(*lead, -1)
    d, kvd = cfg.d_model, cfg.kv_dim
    return y[..., :d], y[..., d : d + kvd], y[..., d + kvd :]


def _qkv_quant_fusable(packed, cfg, compute_dtype, use_kernel):
    """Can the int8 cache write ride the fused norm+QKV kernel's epilogue
    (kernels/fused_mlp.fused_norm_qkv_quant)? Beyond _qkv_prenorm_fusable:
    no rope (cached keys must be roped BEFORE quantization, which the
    epilogue can't do), lane-aligned heads, and the whole weight plane
    resident in one VMEM grid step (the kernel is single-step so the
    epilogue sees every head's full hd span)."""
    if not _qkv_prenorm_fusable(packed, cfg, compute_dtype, use_kernel):
        return False
    n = packed["wqkv"].cols
    return (
        not cfg.rope
        and cfg.head_dim % 128 == 0
        # packed plane bytes (d·N/4) + f32 y block ≤ a conservative VMEM cap
        and cfg.d_model * n // 4 <= 6 << 20
    )


def _proj_qkv_prenorm_quant(packed, x, cfg, prenorm, compute_dtype):
    """norm1 + fused QKV + in-epilogue K/V int8 quantization, ONE launch.

    Returns (q (B…, D) float, kv_codes (rows, 2·kv_dim) int8 in the
    per-head [k|v] interleave, kv_scales (B…, 2·KVH, [C]) f32) shaped for
    ``_cache_write_quantized``. Rows are x's leading dims flattened."""
    from smmb_tpu.kernels.fused_mlp import fused_norm_qkv_quant

    lead = x.shape[:-1]
    q, codes, scales = fused_norm_qkv_quant(
        x.reshape(-1, x.shape[-1]),
        prenorm[0],
        packed["wqkv"],
        packed["qkv_scale"],
        packed["bqkv"],
        eps=prenorm[1],
        d_model=cfg.d_model,
        kv_heads=cfg.kv_heads,
        head_dim=cfg.head_dim,
        compute_dtype=compute_dtype,
    )
    q = q.reshape(*lead, -1)
    if len(lead) == 2:  # extend chunk: (B, C, ·) rows
        b, c = lead
        codes = codes.reshape(b, c, -1)
        scales = scales.reshape(b, c, -1).transpose(0, 2, 1)  # (B, 2KVH, C)
    return q, codes, scales


def attention_decode_core(
    packed: dict,
    x_t: jax.Array,
    cache: dict,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    prenorm=None,
) -> tuple[jax.Array, dict]:
    """``attention_decode_step`` minus the output projection: returns the
    PRE-``wo`` attention mix (B, 1, H·hd) and the updated cache. Exists so
    the block layer can fuse ``wo`` + residual + norm + MLP into one pallas
    launch (kernels/fused_mlp.fused_block_tail) on the dispatch-bound
    decode path.

    ``prenorm=(norm_g, eps)``: x_t is the RAW residual stream and the
    pre-attention RMSNorm runs inside the fused QKV kernel
    (fused_norm_qkv) — one launch, no XLA norm fusion between kernels.
    The caller must have checked ``_qkv_prenorm_fusable``."""
    b, one, d = x_t.shape
    if one != 1:
        raise ValueError(f"decode step takes one token, got T={one}")
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    quant = "kv" in cache
    pos = cache["pos"]
    if (
        prenorm is not None
        and quant
        and _qkv_quant_fusable(packed, cfg, compute_dtype, use_kernel)
    ):
        # int8 cache fast path: the fused norm+QKV kernel quantizes K/V in
        # its epilogue and the step writes the codes directly — no
        # post-hoc quantize fusions at all (VERDICT r4 #1)
        qf, codes, scales = _proj_qkv_prenorm_quant(
            packed, x_t, cfg, prenorm, compute_dtype
        )
        q = _split_heads(qf, cfg)  # codes (B,1,2kvd); scales (B,2KVH,1)
        cache = _cache_write_quantized(cache, codes, scales, pos)
    else:
        if prenorm is not None:
            qf, kf, vf = _proj_qkv_prenorm(
                packed, x_t, cfg, prenorm, compute_dtype
            )
        else:
            qf, kf, vf = _proj_qkv(packed, x_t, cfg, **kw)  # one weight pass
        q = _split_heads(qf, cfg)  # (B,1,H,hd)
        k = _split_heads(kf, cfg, cfg.kv_heads)
        v = _split_heads(vf, cfg, cfg.kv_heads)
        if cfg.rope:
            q = apply_rope(q, pos + jnp.arange(1), cfg.rope_theta)
            k = apply_rope(k, pos + jnp.arange(1), cfg.rope_theta)
        cache = _cache_write(cache, k, v, pos)
    cache_bytes = _cache_code_bytes(cache)
    if (
        use_flash
        and cache.get("valid") is None
        and cfg.head_dim % 128 == 0
        and (
            b == 1
            or quant  # jnp would re-materialize a dequantized cache
            or (
                b <= FLASH_DECODE_MAX_BATCH
                and cache_bytes >= FLASH_DECODE_MIN_CACHE_BYTES
            )
        )
    ):
        if quant:
            from smmb_tpu.kernels.flash_decode import (
                flash_attention_decode_quant,
            )

            out = flash_attention_decode_quant(
                q[:, 0], cache["kv"], cache["kv_scale"], pos,
                window=cfg.window, precision=precision,
                compute_dtype=compute_dtype,
            ).reshape(b, 1, -1)
        else:
            from smmb_tpu.kernels.flash_decode import flash_attention_decode

            out = flash_attention_decode(
                q[:, 0], cache["k"], cache["v"], pos,
                window=cfg.window, precision=precision,
                compute_dtype=compute_dtype,
            ).reshape(b, 1, -1)
    else:
        kc, vc = _cache_kv(cache, cfg.kv_heads)
        out = _decode_attention_math(
            q, kc, vc, pos, cfg.head_dim, precision=precision,
            window=cfg.window, valid=cache.get("valid"),
        )
    return out, cache


def attention_extend(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> tuple[jax.Array, dict]:
    """Chunked prefill: append a (B, C, D) chunk at the cache position and
    attend each chunk token causally over everything cached so far.

    Generalizes ``attention_decode_step`` (C=1) and, composed over chunks
    starting from an empty cache, computes exactly ``attention_prefill``'s
    output with O(B·C·D + B·C·max_len) peak attention memory instead of
    O(B·T²) — the serving answer for prompts too long to prefill in one
    shot. Returns (y (B, C, D), new_cache).

    ``use_flash=True`` reads the cache through the flash-chunk kernel
    (kernels/flash_decode.flash_attention_chunk): O(pos+C) HBM traffic
    per call, in-kernel int8 dequant, and — because it is the SAME kernel
    and accumulation order as the decode step's flash path — a token's
    attention output is bitwise identical whether decoded alone or inside
    this chunk, the property speculative-decode verification needs. Falls
    back to the jnp path for ragged ``valid`` caches or head_dim % 128."""
    out, cache = attention_extend_core(
        packed, x, cache, cfg,
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision, use_flash=use_flash,
    )
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    y = _proj(packed, "wo", out, cfg, **kw)
    return y, cache


def attention_extend_core(
    packed: dict,
    x: jax.Array,
    cache: dict,
    cfg: TernaryAttentionConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    prenorm=None,
) -> tuple[jax.Array, dict]:
    """``attention_extend`` minus the output projection (see
    ``attention_decode_core`` — same split, chunk case, same ``prenorm``
    contract). Returns the pre-``wo`` mix (B, C, H·hd) and the updated
    cache."""
    b, c, d = x.shape
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    quant = "kv" in cache
    pos = cache["pos"]
    if (
        prenorm is not None
        and quant
        and _qkv_quant_fusable(packed, cfg, compute_dtype, use_kernel)
    ):
        # same epilogue-quantized write as the decode step (row-identical
        # per token — the spec-decode contract holds through it)
        qf, codes, scales = _proj_qkv_prenorm_quant(
            packed, x, cfg, prenorm, compute_dtype
        )
        q = _split_heads(qf, cfg)
        cache = _cache_write_quantized(cache, codes, scales, pos)
    else:
        if prenorm is not None:
            qf, kf, vf = _proj_qkv_prenorm(
                packed, x, cfg, prenorm, compute_dtype
            )
        else:
            qf, kf, vf = _proj_qkv(packed, x, cfg, **kw)  # one weight pass
        q = _split_heads(qf, cfg)  # (B,C,H,hd)
        k = _split_heads(kf, cfg, cfg.kv_heads)
        v = _split_heads(vf, cfg, cfg.kv_heads)
        if cfg.rope:
            chunk_pos = pos + jnp.arange(c)
            q = apply_rope(q, chunk_pos, cfg.rope_theta)
            k = apply_rope(k, chunk_pos, cfg.rope_theta)
        cache = _cache_write(cache, k, v, pos)
    from smmb_tpu.kernels.flash_decode import flash_chunk_rows_ok

    code_buf = cache["kv"] if quant else cache["k"]
    if (
        use_flash
        and cache.get("valid") is None
        and cfg.head_dim % 128 == 0
        # large chunks blow the kernel's (C·H, ·) VMEM scratch — fall back
        # to the jnp chunk path rather than OOM (ADVICE r4)
        and flash_chunk_rows_ok(
            c, cfg.n_heads, cfg.head_dim, code_buf.shape[-1],
            code_buf.dtype.itemsize,
            jnp.dtype(compute_dtype).itemsize if compute_dtype else 4,
        )
    ):
        if quant:
            from smmb_tpu.kernels.flash_decode import (
                flash_attention_chunk_quant,
            )

            out = flash_attention_chunk_quant(
                q, cache["kv"], cache["kv_scale"], pos,
                window=cfg.window, precision=precision,
                compute_dtype=compute_dtype,
            ).reshape(b, c, -1)
        else:
            from smmb_tpu.kernels.flash_decode import flash_attention_chunk

            out = flash_attention_chunk(
                q, cache["k"], cache["v"], pos,
                window=cfg.window, precision=precision,
                compute_dtype=compute_dtype,
            ).reshape(b, c, -1)
    else:
        kc, vc = _cache_kv(cache, cfg.kv_heads)
        out = _chunk_attention_math(
            q, kc, vc, pos, cfg.head_dim, precision=precision,
            window=cfg.window, valid=cache.get("valid"),
        )
    return out, cache


def attention_math_chunked(
    q, k, v, cfg: TernaryAttentionConfig, chunk: int = 512, precision=None
):
    """Memory-efficient attention for long-context TRAINING (the
    differentiable analog of the flash kernel; Rabe & Staats' recipe).

    Same (B, T, D) → (B, T, D) contract as ``_attention_math``, but the
    (T, T) score tensor never materializes: a ``lax.scan`` over KV chunks
    carries the online softmax (m, l, acc), and the scan body is
    ``jax.checkpoint``-ed, so the BACKWARD pass recomputes each chunk's
    scores instead of storing them — O(T·chunk) peak memory forward and
    backward. Autodiff just works (pure jnp); use for QAT at context
    lengths where the einsum path's T² residuals would not fit.
    """
    b, t, d = q.shape
    h, hd = cfg.n_heads, cfg.head_dim
    kvh = cfg.kv_heads
    g = h // kvh
    if t % chunk:
        raise ValueError(f"T={t} % chunk={chunk} != 0")
    q, k = _rope_qk(q, k, cfg, jnp.arange(t))
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))

    qg = q.reshape(b, t, kvh, g, hd).transpose(0, 2, 3, 1, 4)
    kh = k.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    n = t // chunk
    kc = kh.reshape(b, kvh, n, chunk, hd).transpose(2, 0, 1, 3, 4)
    vc = vh.reshape(b, kvh, n, chunk, hd).transpose(2, 0, 1, 3, 4)
    q_pos = jnp.arange(t)

    @jax.checkpoint
    def body(carry, inp):
        m, l, acc = carry
        kb, vb, i = inp
        scores = jnp.einsum(
            "bkgqd,bktd->bkgqt", qg, kb,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale  # (B, KVH, G, T, chunk)
        k_pos = i * chunk + jnp.arange(chunk)
        live = jnp.ones((t, chunk), bool)
        if cfg.causal:
            live = q_pos[:, None] >= k_pos[None, :]
            if cfg.window is not None:
                # window applies under causal only — mirroring the
                # serving einsum path exactly (QAT must train what serves)
                live = jnp.logical_and(
                    live, q_pos[:, None] - k_pos[None, :] < cfg.window
                )
        scores = jnp.where(live[None, None, None], scores, -1e30)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkgqt,bktd->bkgqd", p, vb.astype(jnp.float32),
            precision=precision,
        )
        return (m_new, l, acc), None

    m0 = jnp.full((b, kvh, g, t), -1e30, jnp.float32)
    l0 = jnp.zeros((b, kvh, g, t), jnp.float32)
    a0 = jnp.zeros((b, kvh, g, t, hd), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, a0), (kc, vc, jnp.arange(n))
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(b, t, d).astype(q.dtype)
    )


def qat_attention_forward(
    params: dict,
    x: jax.Array,
    cfg: TernaryAttentionConfig,
    attn_chunk: int | None = None,
) -> jax.Array:
    """Training forward: STE-ternarized dense projections (differentiable),
    mirroring the serving math like models/train.qat_forward.
    ``attn_chunk`` switches the attention math to the memory-efficient
    scan (attention_math_chunked) for long-context training."""

    def proj(name, inp):
        w = params[name]
        wq = ternarize_ste(w) * absmean_scale(w)
        return (
            jnp.dot(inp, wq, preferred_element_type=jnp.float32)
            + params[name.replace("w", "b")]
        )

    q = proj("wq", x)
    k = proj("wk", x)
    v = proj("wv", x)
    if attn_chunk is None:
        att = _attention_math(q, k, v, cfg)
    else:
        att = attention_math_chunked(q, k, v, cfg, chunk=attn_chunk)
    return proj("wo", att)
