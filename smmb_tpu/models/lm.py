"""Tiny ternary causal language model: the end-to-end serving showpiece.

Composes the framework's model stack — token + learned-position embeddings,
N pre-norm ternary transformer blocks (models/transformer.py), a final
RMSNorm, and a ternary LM head — into a complete decoder-only LM with the
two serving entry points a production stack needs:

* ``lm_prefill`` — prompt pass filling the per-block KV caches.
* ``lm_decode_step`` / ``generate`` — O(T·D) incremental decode; ``generate``
  is a single jitted ``lax.scan`` over greedy steps (static shapes: the
  cache pytree is preallocated at ``max_len``).

Every matmul FLOP (QKV/out projections, MLP halves, LM head) runs through
the 2-bit packed Pallas SpMM; embeddings and norms are the tiny dense
remainder, as in ternary-LLM recipes (BitNet-style). Attention is
position-free, so sequence order comes from the learned positional table.

No reference analog (the reference stops at single layers,
/root/reference/main.cpp:258-268); this is the BASELINE.json north-star
"serving completeness" direction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from smmb_tpu.models.transformer import (
    TernaryBlockConfig,
    pack_block,
    rmsnorm,
)
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.formats.packed import pack_ternary_device
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class TernaryLMConfig:
    vocab: int
    d_model: int
    n_heads: int
    d_ff: int
    n_layers: int
    max_len: int = 1024
    alpha: float = 0.2
    non_zero: int = 2
    eps: float = 1e-6
    n_kv_heads: int | None = None  # grouped-query attention; None = MHA
    rope: bool = False  # rotary Q/K embeddings (composes with the learned
    rope_theta: float = 10000.0  # absolute positions, which stay on)
    window: int | None = None  # sliding-window attention; None = full causal
    # n_experts switches every block's FFN to the routed ternary mixture
    # (models/moe_block.py — the Switch/Mixtral architecture); d_ff becomes
    # the per-expert width. None = dense MLP blocks.
    n_experts: int | None = None
    top_k: int = 1
    capacity_factor: float = 1.25

    @property
    def block(self):
        if self.n_experts is not None:
            from smmb_tpu.models.moe_block import TernaryMoEBlockConfig

            return TernaryMoEBlockConfig(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                n_experts=self.n_experts,
                top_k=self.top_k,
                capacity_factor=self.capacity_factor,
                alpha=self.alpha,
                causal=True,
                non_zero=self.non_zero,
                eps=self.eps,
                n_kv_heads=self.n_kv_heads,
                rope=self.rope,
                rope_theta=self.rope_theta,
                window=self.window,
            )
        return TernaryBlockConfig(
            d_model=self.d_model,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            alpha=self.alpha,
            causal=True,
            non_zero=self.non_zero,
            eps=self.eps,
            n_kv_heads=self.n_kv_heads,
            rope=self.rope,
            rope_theta=self.rope_theta,
            window=self.window,
        )

    @property
    def _blk(self):
        """Block-function table: dense (transformer.py) or MoE
        (moe_block.py) — same interface, selected by ``n_experts``; this
        one indirection is what makes the entire serving stack (generate,
        chunked prefill, beam, speculative decode, quantized/ragged
        caches) architecture-agnostic."""
        if self.n_experts is not None:
            from smmb_tpu.models import moe_block as m

            return {
                "init": m.init_moe_block,
                "forward": m.moe_block_forward,
                "prefill": m.moe_block_prefill,
                "extend": m.moe_block_extend,
                "decode": m.moe_block_decode_step,
                "cache": m.init_moe_block_cache,
            }
        from smmb_tpu.models import transformer as t

        return {
            "init": t.init_block,
            "forward": t.block_forward,
            "prefill": t.block_prefill,
            "extend": t.block_extend,
            "decode": t.block_decode_step,
            "cache": t.init_block_cache,
        }


def init_lm(key: jax.Array, cfg: TernaryLMConfig) -> dict:
    """Dense embeddings/norms + ternary master weights for blocks and head."""
    ke, kp, kh, kb = jax.random.split(key, 4)
    blocks = []
    for k in jax.random.split(kb, cfg.n_layers):
        blocks.append(cfg._blk["init"](k, cfg.block))
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.d_model))
    return {
        "embed": rng.rand_dense(ke, (cfg.vocab, cfg.d_model)) * scale,
        "pos": rng.rand_dense(kp, (cfg.max_len, cfg.d_model)) * scale,
        "blocks": blocks,
        "norm_f": jnp.ones((cfg.d_model,)),
        "head": rng.rand_ternary(
            kh, (cfg.d_model, cfg.vocab), non_zero=cfg.non_zero
        ),
    }


def pack_lm(params: dict, quantize: bool = False) -> dict:
    """Master weights → 2-bit packed serving weights (blocks + LM head)."""
    head = params["head"]
    head_scale = 1.0
    if quantize:
        from smmb_tpu.models.train import absmean_scale, ternarize_ste

        head_scale = absmean_scale(head)
        head = ternarize_ste(head)

    def pack_one(b):
        if "moe" in b:  # MoE block pytree (models/moe_block.py)
            from smmb_tpu.models.moe_block import pack_moe_block

            return pack_moe_block(b, quantize=quantize)
        return pack_block(b, quantize=quantize)

    return {
        "embed": params["embed"],
        "pos": params["pos"],
        "blocks": [pack_one(b) for b in params["blocks"]],
        "norm_f": params["norm_f"],
        "head": pack_ternary_device(head),
        "head_scale": jnp.float32(head_scale),
    }


def _head_logits(packed, h, cfg, compute_dtype, use_kernel):
    b, t, d = h.shape
    h2 = h.reshape(b * t, d)
    if use_kernel:
        y = packed_spmm(h2, packed["head"], compute_dtype=compute_dtype)
    else:
        y = packed_spmm_jnp(h2, packed["head"], dtype=jnp.float32)
    return (y * packed["head_scale"]).reshape(b, t, cfg.vocab)


def lm_forward(
    packed: dict,
    tokens: jax.Array,
    cfg: TernaryLMConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
) -> jax.Array:
    """Full causal forward: (B, T) int tokens → (B, T, vocab) logits.

    ``precision`` reaches the attention einsums (pass HIGHEST for
    decode-vs-full parity; the TPU default rounds the full and incremental
    paths differently at bf16 noise level). ``use_flash`` runs attention
    through the Pallas online-softmax kernel (long-context prompts).
    """
    b, t = tokens.shape
    x = packed["embed"][tokens] + packed["pos"][None, :t]
    for blk in packed["blocks"]:
        x = cfg._blk["forward"](
            blk, x, cfg.block,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash,
        )
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    return _head_logits(packed, h, cfg, compute_dtype, use_kernel)


def lm_init_cache(
    cfg: TernaryLMConfig, batch: int, dtype=jnp.float32,
    quantized: bool = False, ragged: bool = False,
):
    return [
        cfg._blk["cache"](
            cfg.block, batch, cfg.max_len, dtype=dtype,
            quantized=quantized, ragged=ragged,
        )
        for _ in range(cfg.n_layers)
    ]


def lm_prefill(
    packed: dict,
    tokens: jax.Array,
    cache: list,
    cfg: TernaryLMConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    prompt_mask=None,
):
    """Prompt pass: returns (last-position logits (B, vocab), filled cache).

    ``prompt_mask`` (B, T) bool marks real tokens in a LEFT-padded ragged
    batch (real tokens are each row's rightmost run, so every row's last
    prompt token sits at buffer position T-1 and one scalar cache ``pos``
    serves all rows). Requires a ragged cache (lm_init_cache(ragged=True));
    the learned positional embedding indexes each row's logical position
    (pads reuse position 0 — their outputs are masked out of attention)."""
    b, t = tokens.shape
    if prompt_mask is None:
        x = packed["embed"][tokens] + packed["pos"][None, :t]
    else:
        pos_ids = jnp.clip(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0
        )  # (B, T) logical positions
        x = packed["embed"][tokens] + packed["pos"][pos_ids]
    new_cache = []
    for blk, c in zip(packed["blocks"], cache):
        x, c = cfg._blk["prefill"](
            blk, x, c, cfg.block,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash, valid=prompt_mask,
        )
        new_cache.append(c)
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    logits = _head_logits(packed, h, cfg, compute_dtype, use_kernel)
    return logits[:, -1], new_cache


def lm_extend(
    packed: dict,
    tokens: jax.Array,
    cache: list,
    cfg: TernaryLMConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    pos_ids=None,
):
    """Append a (B, C) token chunk at the cache position and return the
    logits at EVERY chunk position: ((B, C, vocab), new cache).

    The multi-token generalization of ``lm_decode_step`` (and the building
    block of chunked prefill and speculative-decode verification): each
    chunk token attends the cache plus its chunk prefix. ``use_flash``
    reads the caches through the flash-chunk kernel — the same kernel as
    the flash decode step, making a token's logits bitwise identical
    between the two paths (speculative-decode exactness).

    ``pos_ids`` (B, C) overrides the learned-positional-embedding indices
    per row (batched speculative decoding: rejected drafts leave dead
    interior cache slots, so a row's LOGICAL position trails its buffer
    position).

    The caller owns the capacity budget (the cache position is dynamic, so
    it cannot be checked at trace time): appending past ``cfg.max_len``
    would clamp the cache write and silently corrupt earlier entries —
    size prompts + steps against ``max_len`` up front the way ``generate``
    and ``generate_speculative`` do."""
    b, c = tokens.shape
    if c > cfg.max_len:
        raise ValueError(f"chunk {c} exceeds max_len={cfg.max_len}")
    pos = cache[0]["pos"]
    if pos_ids is None:
        pe = jax.lax.dynamic_slice(
            packed["pos"], (pos, 0), (c, packed["pos"].shape[1])
        )[None]
    else:
        pe = packed["pos"][pos_ids]  # (B, C, D)
    x = packed["embed"][tokens] + pe
    new_cache = []
    for blk, ch in zip(packed["blocks"], cache):
        x, ch = cfg._blk["extend"](
            blk, x, ch, cfg.block,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash,
        )
        new_cache.append(ch)
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    return _head_logits(packed, h, cfg, compute_dtype, use_kernel), new_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "chunk", "compute_dtype", "use_kernel", "precision"
    ),
)
def lm_prefill_chunked(
    packed: dict,
    tokens: jax.Array,
    cache: list,
    cfg: TernaryLMConfig,
    chunk: int,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
):
    """Prompt pass in fixed-size chunks: ``lax.scan`` over T/chunk segments,
    each attending over the cache filled so far (models/attention.
    attention_extend) — same result as ``lm_prefill`` with O(B·C·D) peak
    activation memory instead of O(B·T·D) (and no T×T score tensor), for
    prompts too long to prefill in one shot. T % chunk must be 0: pick a
    chunk that divides T (every fed token is cached as a real token —
    there is NO pad masking on this path; ragged prompts go through
    ``lm_prefill(prompt_mask=...)``).
    Returns (last-position logits (B, vocab), filled cache)."""
    b, t = tokens.shape
    if t % chunk:
        raise ValueError(f"prompt length {t} not divisible by chunk {chunk}")
    if t > cfg.max_len:
        raise ValueError(
            f"prompt length {t} exceeds max_len={cfg.max_len} — the cache "
            "write would clamp and silently corrupt earlier entries"
        )
    chunks = tokens.reshape(b, t // chunk, chunk).transpose(1, 0, 2)

    def body(cache, toks_c):
        pos = cache[0]["pos"]
        pe = jax.lax.dynamic_slice(
            packed["pos"], (pos, 0), (chunk, packed["pos"].shape[1])
        )
        x = packed["embed"][toks_c] + pe[None]
        new_cache = []
        for blk, c in zip(packed["blocks"], cache):
            x, c = cfg._blk["extend"](
                blk, x, c, cfg.block,
                compute_dtype=compute_dtype, use_kernel=use_kernel,
                precision=precision, use_flash=use_flash,
            )
            new_cache.append(c)
        # emit only the chunk's last hidden state — the head matmul runs
        # once on the final chunk's, not per chunk
        return new_cache, rmsnorm(x[:, -1], packed["norm_f"], cfg.eps)

    cache, last_h = jax.lax.scan(body, cache, chunks)
    logits = _head_logits(
        packed, last_h[-1][:, None], cfg, compute_dtype, use_kernel
    )
    return logits[:, 0], cache


def _reindex_cache(cache: list, idx: jax.Array) -> list:
    """Gather cache rows by beam index (scalars like ``pos`` pass through)."""
    return [
        {
            k_: (v[idx] if getattr(v, "ndim", 0) > 0 else v)
            for k_, v in c.items()
        }
        for c in cache
    ]


def fork_cache(cache: list, n: int) -> list:
    """Prefix caching: broadcast a batch-1 prefilled cache to ``n`` rows.

    Serve a shared prompt once (``lm_prefill`` at batch 1), fork, then run
    ``n`` divergent continuations batched — the prompt's attention work
    and cache bytes are paid once instead of ``n`` times. Rows are
    independent copies from the fork onward (each row's subsequent writes
    land in its own cache row)."""
    if cache:
        code_buf = cache[0]["kv" if "kv" in cache[0] else "k"]
        if code_buf.shape[0] != 1:
            raise ValueError(
                f"fork_cache takes a batch-1 cache, got batch "
                f"{code_buf.shape[0]}"
            )

    def rep(name, a):
        if name == "pos":
            return a
        return jnp.broadcast_to(a, (n,) + a.shape[1:])

    return [{k_: rep(k_, v) for k_, v in c.items()} for c in cache]


def lm_decode_step(
    packed: dict,
    token_t: jax.Array,
    cache: list,
    cfg: TernaryLMConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    pos_ids=None,
    use_flash: bool = False,
):
    """One decode step: (B,) int tokens → ((B, vocab) logits, cache).

    Reads the position from the first block's cache (all blocks advance in
    lockstep); O(T·D) per step via the per-block KV caches. ``pos_ids``
    (B,) overrides the learned-positional-embedding index per row (ragged
    batches: each row's logical position differs from the buffer index).
    ``use_flash`` streams the cache read through the flash-decode kernel
    (not combinable with ragged caches — the blocks fall back).
    """
    pos = cache[0]["pos"]
    if pos_ids is None:
        pe = packed["pos"][pos][None, None]
    else:
        pe = packed["pos"][pos_ids][:, None]
    x = packed["embed"][token_t][:, None, :] + pe
    new_cache = []
    for blk, c in zip(packed["blocks"], cache):
        x, c = cfg._blk["decode"](
            blk, x, c, cfg.block,
            compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash,
        )
        new_cache.append(c)
    h = rmsnorm(x, packed["norm_f"], cfg.eps)
    logits = _head_logits(packed, h, cfg, compute_dtype, use_kernel)
    return logits[:, 0], new_cache


def _qat_lm_forward_aux(
    params: dict,
    tokens: jax.Array,
    cfg: TernaryLMConfig,
    attn_chunk: int | None = None,
):
    """(logits, aux): the QAT forward plus the summed MoE load-balance
    loss (0.0 for dense blocks)."""
    from smmb_tpu.models.train import absmean_scale, ternarize_ste
    from smmb_tpu.models.transformer import qat_block_forward

    b, t = tokens.shape
    x = params["embed"][tokens] + params["pos"][None, :t]
    aux = jnp.float32(0.0)
    for blk in params["blocks"]:
        if cfg.n_experts is not None:
            from smmb_tpu.models.moe_block import qat_moe_block_forward

            x, a = qat_moe_block_forward(
                blk, x, cfg.block, attn_chunk=attn_chunk
            )
            aux = aux + a
        else:
            x = qat_block_forward(blk, x, cfg.block, attn_chunk=attn_chunk)
    h = rmsnorm(x, params["norm_f"], cfg.eps)
    w = params["head"]
    wq = ternarize_ste(w) * absmean_scale(w)
    return jnp.dot(h, wq, preferred_element_type=jnp.float32), aux


def qat_lm_forward(
    params: dict,
    tokens: jax.Array,
    cfg: TernaryLMConfig,
    attn_chunk: int | None = None,
) -> jax.Array:
    """Training forward on master weights: STE-ternarized blocks + head
    (differentiable); embeddings, positions, and norm gains train dense.
    Mirrors ``lm_forward``'s serving math so ``pack_lm(quantize=True)``
    serves exactly what was trained. ``attn_chunk`` = memory-efficient
    attention (O(T·chunk) instead of O(T²) residuals; long contexts)."""
    return _qat_lm_forward_aux(params, tokens, cfg, attn_chunk)[0]


def make_lm_train_step(
    cfg: TernaryLMConfig,
    learning_rate: float = 1e-3,
    accum_steps: int = 1,
    attn_chunk: int | None = None,
    aux_weight: float = 1e-2,
):
    """(init_opt, train_step) for next-token cross-entropy on the ternary LM.

    ``train_step(params, opt_state, tokens) -> (params, opt_state, loss)``
    is pure and jittable; shard ``tokens`` over a data axis for DP training
    (parallel/dp_train.py compiles exactly this step with mesh shardings).

    ``accum_steps > 1`` splits the batch into that many microbatches and
    accumulates their mean gradients in a ``lax.scan`` before the single
    optimizer update — identical math to the full-batch step (each
    microbatch is the same size, so the mean of means is the batch mean)
    at 1/``accum_steps`` of the activation memory. The scan keeps one set
    of forward/backward buffers live at a time; XLA cannot do this
    transform itself (the optimizer update is sequenced after all
    microbatches).
    """
    import optax

    tx = optax.adam(learning_rate)

    def loss_fn(params, tokens):
        logits, aux = _qat_lm_forward_aux(
            params, tokens, cfg, attn_chunk=attn_chunk
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], tokens[:, 1:]
        ).mean()
        # MoE blocks contribute the Switch load-balance aux (0 for dense)
        return ce + aux_weight * aux

    def init_opt(params):
        return tx.init(params)

    def batch_grad(params, tokens):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, tokens)
        b = tokens.shape[0]
        if b % accum_steps:
            raise ValueError(
                f"batch {b} not divisible by accum_steps {accum_steps}"
            )
        micro = tokens.reshape(accum_steps, b // accum_steps, -1)

        def body(carry, mb):
            loss_acc, grad_acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            return (
                loss_acc + loss,
                jax.tree.map(jnp.add, grad_acc, grads),
            ), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss_sum, grad_sum), _ = jax.lax.scan(body, (0.0, zeros), micro)
        inv = 1.0 / accum_steps
        return loss_sum * inv, jax.tree.map(lambda g: g * inv, grad_sum)

    def train_step(params, opt_state, tokens):
        loss, grads = batch_grad(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, train_step


def _make_sampler(
    temperature: float, top_k: int | None, top_p: float | None = None
):
    """Token-selection rule for ``generate``.

    temperature == 0 → greedy argmax (key unused). Otherwise softmax
    sampling at the given temperature, optionally truncated to the top-k
    logits and/or the top-p (nucleus) probability mass — both masks apply
    before renormalization, like the standard serving stacks. Everything
    is static-shape: nucleus truncation sorts once and masks by the
    cumulative probability BEFORE each token, so the smallest set with
    mass ≥ p survives (the first token always does).
    """
    if temperature == 0.0:
        return lambda key, logits: jnp.argmax(logits, axis=-1)

    def sample(key, logits):
        logits = logits / jnp.float32(temperature)
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p is not None:
            srt = jnp.sort(logits, axis=-1, descending=True)
            probs = jax.nn.softmax(srt, axis=-1)
            # mass strictly before each sorted position; keep while < p
            before = jnp.cumsum(probs, axis=-1) - probs
            keep = before < top_p
            # threshold = smallest kept logit (keep is a prefix of the sort)
            cut = jnp.min(
                jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True
            )
            logits = jnp.where(logits < cut, -jnp.inf, logits)
        return jax.random.categorical(key, logits, axis=-1)

    return sample


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "beam", "compute_dtype", "use_kernel"),
)
def generate_beam(
    packed: dict,
    prompt: jax.Array,
    cfg: TernaryLMConfig,
    steps: int,
    *,
    beam: int = 4,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Beam search: (1, T) prompt → ((beam, steps) tokens, (beam,) scores).

    Fixed-width beam over summed log-probabilities (no EOS semantics —
    the framework is tokenizer-agnostic; fixed-length hypotheses compare
    fairly without length normalization). Beams are rows of a forked KV
    cache (``fork_cache``); each step scores beam×vocab continuations,
    keeps the top ``beam``, and gathers cache rows by surviving-beam
    index. ``beam=1`` reduces exactly to greedy ``generate``. Returned
    hypotheses are sorted best-first.
    """
    b, t = prompt.shape
    if b != 1:
        raise ValueError(f"beam search is batch-1 only (got batch {b})")
    if t + steps > cfg.max_len:
        raise ValueError(
            f"prompt_len={t} + steps={steps} exceeds max_len={cfg.max_len}"
        )
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    cache = lm_init_cache(cfg, 1, dtype=compute_dtype)
    logits, cache = lm_prefill(packed, prompt, cache, cfg, **kw)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
    scores, tok = jax.lax.top_k(logp, beam)  # (beam,), (beam,)
    cache = fork_cache(cache, beam)
    toks = jnp.zeros((beam, steps), jnp.int32)
    toks = toks.at[:, 0].set(tok)

    def step(carry, i):
        tok, scores, cache, toks = carry
        logits, cache = lm_decode_step(packed, tok, cache, cfg, **kw)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))  # (beam, V)
        cand = scores[:, None] + logp  # (beam, V)
        scores, flat = jax.lax.top_k(cand.reshape(-1), beam)
        src = flat // cfg.vocab  # surviving beam each came from
        tok = (flat % cfg.vocab).astype(jnp.int32)
        cache = _reindex_cache(cache, src)
        toks = toks[src].at[:, i].set(tok)
        return (tok, scores, cache, toks), None

    (_, scores, _, toks), _ = jax.lax.scan(
        step, (tok, scores, cache, toks), jnp.arange(1, steps)
    )
    return toks, scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "steps", "compute_dtype", "use_kernel", "temperature",
        "top_k", "top_p", "use_flash", "kv_quant", "prefill_chunk",
    ),
)
def generate(
    packed: dict,
    prompt: jax.Array,
    cfg: TernaryLMConfig,
    steps: int,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    temperature: float = 0.0,
    top_k: int | None = None,
    top_p: float | None = None,
    key: jax.Array | None = None,
    use_flash: bool = False,
    kv_quant: bool = False,
    prompt_mask: jax.Array | None = None,
    prefill_chunk: int | None = None,
) -> jax.Array:
    """Generation: (B, T) prompt → (B, steps) continuation tokens.

    Greedy by default; ``temperature > 0`` switches to softmax sampling
    (optionally top-k truncated) driven by ``key``. One jitted program:
    prefill then a ``lax.scan`` of decode steps — static shapes throughout
    (cache preallocated at ``cfg.max_len``). ``use_flash`` routes the
    prefill through the flash-attention kernel AND the decode steps'
    cache reads through the flash-decode kernel (kernels/flash_decode.py:
    O(pos) cache traffic per step, in-kernel int8 dequant under
    ``kv_quant`` — the jnp path materializes a dequantized cache copy
    per step, measured 2-3× slower at long context).

    ``prompt_mask`` (B, T) bool serves a RAGGED batch: left-pad each
    prompt (real tokens rightmost) and mark the real ones. Pad slots are
    masked out of all attention; the learned positional embedding uses
    each row's logical position. Not combinable with ``use_flash``.

    ``prefill_chunk`` routes the prompt through ``lm_prefill_chunked``
    (T % chunk == 0 required): O(B·C·D) prefill memory — and for MoE LMs
    it caps the drop-free routing's dispatch tensor at chunk size, which
    one-shot prefill grows quadratically in T. Not combinable with
    ``prompt_mask`` or ``use_flash``.
    """
    if prefill_chunk is not None and (
        prompt_mask is not None or use_flash
    ):
        raise ValueError(
            "prefill_chunk is not combinable with prompt_mask/use_flash"
        )
    if prompt.shape[1] + steps > cfg.max_len:
        # dynamic_update_slice clamps out-of-range writes, which would
        # silently corrupt the cache — fail loudly instead
        raise ValueError(
            f"prompt_len={prompt.shape[1]} + steps={steps} exceeds "
            f"max_len={cfg.max_len}"
        )
    if temperature > 0.0 and key is None:
        raise ValueError("temperature > 0 sampling needs a PRNG key")
    if key is None:
        key = jax.random.PRNGKey(0)  # unused by the greedy sampler
    sampler = _make_sampler(temperature, top_k, top_p)
    kw = dict(compute_dtype=compute_dtype, use_kernel=use_kernel)
    # the cache follows the serving dtype: a bf16 cache halves the decode's
    # cache read traffic, which dominates at batch x long-context;
    # kv_quant=True stores int8 codes + per-token absmax scales instead
    # (4x less read traffic than f32 at ~1e-2 relative cache error)
    cache = lm_init_cache(
        cfg, prompt.shape[0], dtype=compute_dtype, quantized=kv_quant,
        ragged=prompt_mask is not None,
    )
    if prefill_chunk is not None:
        logits, cache = lm_prefill_chunked(
            packed, prompt, cache, cfg, chunk=prefill_chunk, **kw
        )
    else:
        logits, cache = lm_prefill(
            packed, prompt, cache, cfg, use_flash=use_flash,
            prompt_mask=prompt_mask, **kw
        )
    key, k0 = jax.random.split(key)
    tok0 = sampler(k0, logits)
    # per-row logical positions for the learned embedding (ragged only)
    row_pos0 = (
        None if prompt_mask is None
        else jnp.sum(prompt_mask.astype(jnp.int32), axis=1)
    )

    def step(carry, _):
        tok, cache, key, row_pos = carry
        logits, cache = lm_decode_step(
            packed, tok, cache, cfg, pos_ids=row_pos,
            use_flash=use_flash and row_pos is None, **kw
        )
        key, ks = jax.random.split(key)
        nxt = sampler(ks, logits)
        if row_pos is not None:
            row_pos = row_pos + 1
        return (nxt, cache, key, row_pos), tok

    (_, _, _, _), toks = jax.lax.scan(
        step, (tok0, cache, key, row_pos0), None, length=steps
    )
    return jnp.moveaxis(toks, 0, 1)  # (B, steps)
