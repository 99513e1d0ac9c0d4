"""Speculative decoding: a small ternary draft LM proposes, the target
verifies k tokens per step (net-new serving feature; the reference has no
serving stack at all, SURVEY.md §5).

Greedy speculative decoding is exactly output-equivalent to the target's
own greedy ``generate`` — the draft only changes WHEN tokens are computed,
never WHAT. Each round:

1. the draft runs k+1 incremental decode steps from the last accepted
   token (k proposals + one extra step that consumes the k-th proposal so
   the draft cache stays position-synchronized with the target on full
   acceptance);
2. the target verifies the whole ``[t_last, d_1..d_k]`` chunk with ONE
   ``lm_extend`` call — k+1 positions of logits for the cost of one
   cache-attention pass (the MXU sees a (k+1)-row matmul instead of k+1
   single-row ones: this is where the speedup lives — ternary weights
   stream from HBM once per round instead of once per token);
3. the longest prefix of proposals matching the target's argmax is
   accepted, plus the target's own next token (the correction on a
   mismatch, the bonus token on full acceptance) — n_acc+1 tokens per
   round, ≥ 1 always, so the loop terminates;
4. both caches rewind their position to the accepted length (entries past
   it are masked by position and overwritten by later writes).

TPU-first shape discipline: the emit buffer is (1, steps+k+1) and every
round writes a full (k+1)-wide slab at the current count with
``dynamic_update_slice`` — garbage beyond the accepted prefix is
overwritten by the next round (static shapes, no data-dependent sizes).

Batch 1 serves with the scalar-position rewind above. Batch > 1 (round 5,
VERDICT r4 #2) keeps every cache WRITE position-aligned across rows — the
TPU answer to per-row acceptance — by letting rejected drafts become DEAD
INTERIOR cache slots instead of rewinding:

* every round both caches append the full (k+1)-token chunk at the shared
  buffer position (one aligned dus, exactly like batch 1);
* after acceptance, a (B, k+1) ``valid``-mask slab marks each row's
  accepted prefix (t_last + n_acc drafts) and clears its dead tail — the
  ragged-batch machinery (init_kv_cache(ragged=True)) already masks
  invalid columns out of every attention read;
* a row's LOGICAL position (for the learned positional embedding) trails
  its buffer position, tracked per row and passed via ``pos_ids``.

The cache buffer inflates by (k+1)/(mean n_acc+1) — dead slots cost cache
reads but never correctness. RoPE is rejected at batch > 1 (buffer-position
rope would distort relative offsets across dead slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from smmb_tpu.models.lm import (
    TernaryLMConfig,
    lm_decode_step,
    lm_extend,
    lm_forward,
    lm_init_cache,
    lm_prefill,
)


def _set_pos(cache: list, pos) -> list:
    """Rewind every block cache to ``pos`` consumed tokens."""
    return [{**c, "pos": pos} for c in cache]


def make_draft_distill_step(
    target: dict,
    target_cfg: TernaryLMConfig,
    draft_cfg: TernaryLMConfig,
    learning_rate: float = 1e-3,
    temperature: float = 2.0,
):
    """(init_opt, distill_step) training a draft's MASTERS to imitate the
    packed target — the step that makes speculative decoding pay off (a
    random draft gets ~1/vocab acceptance; a distilled draft tracks the
    target's argmax where it matters).

    ``distill_step(draft_params, opt_state, tokens) -> (params, opt,
    loss)``: soft cross-entropy at ``temperature`` between the frozen
    target's logits (jnp packed path, constant) and the draft's STE
    forward — so the trained masters pack straight into the 2-bit serving
    draft via ``pack_lm(quantize=True)``. Vocabularies must match.
    """
    import optax

    from smmb_tpu.models.lm import qat_lm_forward

    if target_cfg.vocab != draft_cfg.vocab:
        raise ValueError(
            f"vocab mismatch: target {target_cfg.vocab} vs draft "
            f"{draft_cfg.vocab}"
        )
    tx = optax.adam(learning_rate)
    inv_t = 1.0 / temperature

    def loss_fn(draft_params, tokens):
        t_logits = jax.lax.stop_gradient(
            lm_forward(target, tokens, target_cfg, use_kernel=False)
        )
        d_logits = qat_lm_forward(draft_params, tokens, draft_cfg)
        p = jax.nn.softmax(t_logits * inv_t, axis=-1)
        logq = jax.nn.log_softmax(d_logits * inv_t, axis=-1)
        return -jnp.mean(jnp.sum(p * logq, axis=-1))

    def init_opt(params):
        return tx.init(params)

    def distill_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, distill_step


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_cfg", "draft_cfg", "steps", "k",
        "compute_dtype", "use_kernel", "precision", "use_flash",
        "return_stats",
    ),
)
def generate_speculative(
    target: dict,
    draft: dict,
    prompt: jax.Array,
    target_cfg: TernaryLMConfig,
    draft_cfg: TernaryLMConfig,
    steps: int,
    *,
    k: int = 4,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
    use_flash: bool = False,
    return_stats: bool = False,
) -> jax.Array:
    """(1, T) prompt → (1, steps) greedy continuation of the TARGET model,
    computed with draft-proposed/target-verified rounds of k proposals.

    ``target`` / ``draft`` are packed LMs (pack_lm) sharing a vocabulary;
    the draft is typically a fraction of the target's size. Output is
    token-identical to ``generate(target, ..., steps)``.

    ``use_flash=True`` routes prefills, the draft's decode steps AND the
    target's verify chunks through the flash kernels. Exactness note: the
    verify chunk (lm_extend, C=k+1) and the plain decode step (C=1) then
    read the cache through the SAME Pallas kernel with the same tile
    order and online-softmax accumulation, and every projection row is
    M-independent in the packed SpMM — so verify logits are bitwise
    identical to what the step path would produce, making greedy spec
    decode token-exact on hardware (round-3 VERDICT #3: the einsum verify
    path argmax-diverged from the flash step path on bf16 near-ties,
    agreement 0.80). With use_flash=False both paths use the jnp einsum
    attention (C=1 vs C=k+1 reductions that XLA may compile differently)
    — CPU tests pass but bf16-on-MXU exactness is only guaranteed with
    use_flash=True.
    """
    b, t = prompt.shape
    if b > 1:
        return _generate_speculative_batched(
            target, draft, prompt, target_cfg, draft_cfg, steps,
            k=k, compute_dtype=compute_dtype, use_kernel=use_kernel,
            precision=precision, use_flash=use_flash,
            return_stats=return_stats,
        )
    if t + steps + k + 1 > min(target_cfg.max_len, draft_cfg.max_len):
        raise ValueError(
            f"prompt {t} + steps {steps} + k+1 {k + 1} exceeds max_len "
            f"{min(target_cfg.max_len, draft_cfg.max_len)}"
        )
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision,
    )
    tc = lm_init_cache(target_cfg, 1, dtype=compute_dtype)
    dc = lm_init_cache(draft_cfg, 1, dtype=compute_dtype)
    logits, tc = lm_prefill(
        target, prompt, tc, target_cfg, use_flash=use_flash, **kw
    )
    _, dc = lm_prefill(draft, prompt, dc, draft_cfg, use_flash=use_flash, **kw)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1,)

    out = jnp.zeros((1, steps + k + 1), jnp.int32)
    out = jax.lax.dynamic_update_slice(out, tok0[:, None], (0, 0))

    def body(carry):
        count, t_last, tc, dc, out, rounds = carry
        p_t, p_d = tc[0]["pos"], dc[0]["pos"]

        # 1) draft proposes k tokens (plus the cache-sync step)
        def dstep(c, _):
            tok, cache = c
            lg, cache = lm_decode_step(
                draft, tok, cache, draft_cfg, use_flash=use_flash, **kw
            )
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, dc), ds = jax.lax.scan(
            dstep, (t_last, dc), None, length=k + 1
        )  # ds: (k+1, 1)
        drafts = ds[:k, 0]  # (k,)

        # 2) target verifies the whole chunk in one extend (under
        # use_flash: the flash-chunk kernel — bitwise identical per row
        # to the flash decode step, see docstring)
        vlogits, tc = lm_extend(
            target,
            jnp.concatenate([t_last[:, None], drafts[None, :]], axis=1),
            tc, target_cfg, use_flash=use_flash, **kw,
        )
        preds = jnp.argmax(vlogits, axis=-1)[0].astype(jnp.int32)  # (k+1,)

        # 3) longest matching prefix + the target's own next token
        match = (preds[:k] == drafts).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(match))
        nxt = jnp.take(preds, n_acc)  # correction or bonus
        idx = jnp.arange(k + 1)
        drafts_ext = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
        slab = jnp.where(idx < n_acc, drafts_ext, nxt)[None, :]
        out = jax.lax.dynamic_update_slice(out, slab, (0, count))

        # 4) rewind both caches to the accepted length
        consumed = n_acc + 1
        tc = _set_pos(tc, p_t + consumed)
        dc = _set_pos(dc, p_d + consumed)
        return (count + consumed, nxt[None], tc, dc, out, rounds + 1)

    def cond(carry):
        return carry[0] < steps

    count0 = jnp.int32(1)
    count, _, _, _, out, rounds = jax.lax.while_loop(
        cond, body, (count0, tok0, tc, dc, out, jnp.int32(0))
    )
    if return_stats:
        # emitted per round = n_acc + 1, so the mean accepted proposals
        # per round is (tokens emitted by rounds) / rounds − 1
        return out[:, :steps], {
            "rounds": rounds,
            "mean_accepted": (count - 1) / jnp.maximum(rounds, 1) - 1.0,
        }
    return out[:, :steps]


def _clear_dead(cache: list, base, keep, k: int) -> list:
    """Mark each row's accepted prefix of the round's (k+1)-token chunk
    valid and its rejected tail dead: valid[:, base+j] = j < keep[r]."""
    b = keep.shape[0]
    mask = jnp.arange(k + 1)[None] < keep[:, None]  # (B, k+1)
    return [
        {
            **c,
            "valid": jax.lax.dynamic_update_slice(
                c["valid"], mask, (0, base)
            ),
        }
        for c in cache
    ]


def _generate_speculative_batched(
    target: dict,
    draft: dict,
    prompt: jax.Array,
    target_cfg: TernaryLMConfig,
    draft_cfg: TernaryLMConfig,
    steps: int,
    *,
    k: int,
    compute_dtype,
    use_kernel: bool,
    precision,
    use_flash: bool,
    return_stats: bool,
):
    """Batched greedy speculative decoding via aligned writes + dead-slot
    ``valid`` masks (module docstring). Per row, output is token-identical
    to the target's own greedy continuation under the same attention path
    (the ragged caches read through the jnp attention math)."""
    b, t = prompt.shape
    if target_cfg.rope or draft_cfg.rope:
        raise ValueError(
            "batched speculative decoding requires rope=False: dead "
            "interior cache slots distort buffer-position rope offsets"
        )
    # worst case every round accepts only 1 token: steps-1 rounds of k+1
    # buffer slots after the prompt (static shapes — checked at trace)
    need = t + (steps - 1) * (k + 1) + 1
    if need > min(target_cfg.max_len, draft_cfg.max_len):
        raise ValueError(
            f"batched spec decode can consume up to prompt {t} + "
            f"(steps-1)·(k+1) = {need} buffer slots; max_len "
            f"{min(target_cfg.max_len, draft_cfg.max_len)} is too small"
        )
    kw = dict(
        compute_dtype=compute_dtype, use_kernel=use_kernel,
        precision=precision,
    )
    tc = lm_init_cache(target_cfg, b, dtype=compute_dtype, ragged=True)
    dc = lm_init_cache(draft_cfg, b, dtype=compute_dtype, ragged=True)
    logits, tc = lm_prefill(
        target, prompt, tc, target_cfg, use_flash=use_flash, **kw
    )
    _, dc = lm_prefill(draft, prompt, dc, draft_cfg, use_flash=use_flash, **kw)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)

    w = steps + k + 1
    out = jnp.zeros((b, w), jnp.int32)
    out = out.at[:, 0].set(tok0)
    cols = jnp.arange(w)[None]  # (1, W)

    def body(carry):
        count, t_last, llen, tc, dc, out, rounds = carry
        p_t, p_d = tc[0]["pos"], dc[0]["pos"]

        # 1) draft proposes k tokens (+ the cache-sync step); logical
        # position of step j's input token is llen + j per row
        def dstep(c, j):
            tok, cache = c
            lg, cache = lm_decode_step(
                draft, tok, cache, draft_cfg, pos_ids=llen + j,
                use_flash=use_flash, **kw
            )
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, dc), ds = jax.lax.scan(
            dstep, (t_last, dc), jnp.arange(k + 1)
        )  # ds: (k+1, B)
        drafts = ds[:k].T  # (B, k)

        # 2) target verifies the whole chunk in one extend
        vlogits, tc = lm_extend(
            target,
            jnp.concatenate([t_last[:, None], drafts], axis=1),
            tc, target_cfg, use_flash=use_flash,
            pos_ids=llen[:, None] + jnp.arange(k + 1)[None], **kw,
        )
        preds = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)  # (B, k+1)

        # 3) per-row longest matching prefix + the target's own next token
        match = (preds[:, :k] == drafts).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,)
        nxt = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
        idx = jnp.arange(k + 1)[None]
        drafts_ext = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        slab = jnp.where(idx < n_acc[:, None], drafts_ext, nxt[:, None])

        # per-row scatter of the (k+1) slab at each row's count
        rel = cols - count[:, None]  # (B, W)
        in_slab = jnp.logical_and(rel >= 0, rel < k + 1)
        vals = jnp.take_along_axis(slab, jnp.clip(rel, 0, k), axis=1)
        out = jnp.where(in_slab, vals, out)

        # 4) instead of rewinding, mark each row's rejected tail DEAD in
        # both caches (writes stayed aligned at p_t / p_d)
        consumed = n_acc + 1
        tc = _clear_dead(tc, p_t, consumed, k)
        dc = _clear_dead(dc, p_d, consumed, k)
        return (
            count + consumed, nxt, llen + consumed, tc, dc, out, rounds + 1
        )

    def cond(carry):
        return jnp.min(carry[0]) < steps

    count0 = jnp.ones((b,), jnp.int32)
    llen0 = jnp.full((b,), t, jnp.int32)
    count, _, _, _, _, out, rounds = jax.lax.while_loop(
        cond, body, (count0, tok0, llen0, tc, dc, out, jnp.int32(0))
    )
    if return_stats:
        return out[:, :steps], {
            "rounds": rounds,
            "mean_accepted": jnp.mean(
                (count - 1) / jnp.maximum(rounds, 1) - 1.0
            ),
        }
    return out[:, :steps]
