"""LoRA adapters over frozen 2-bit ternary weights (net-new; the
fine-tuning story for a served ternary model).

The packed execution format is the POINT of this framework — 2-bit
weights streaming from HBM — so fine-tuning must not touch them. LoRA
composes perfectly: each adapted projection serves

    y = packed_spmm(x, W_2bit) + scale · (x A) B

with A (d_in, r), B (r, d_out) tiny f32 residuals (r ≪ d). The base keeps
its 16×-compressed weight traffic; the adapter adds two thin matmuls the
MXU barely notices.

Mechanically, adapters ATTACH INTO the packed pytree as ``<name>_lora``
entries (models/attention._proj and models/transformer._mlp_half look
them up), so every SINGLE-DEVICE serving path — forward, prefill, chunked
prefill, KV decode, generate, beam search, speculative decoding — picks
them up with zero API changes: an adapted model is just another packed
pytree. The mesh-sharded paths (tp_transformer/sp_block) flatten packed
dicts through fixed key lists and do not carry adapters yet — their
partitioners REJECT adapted models rather than silently serving the
frozen base.

Training differentiates ONLY the adapters: the base forward runs the jnp
packed path (exact same math the kernel serves, differentiable w.r.t.
activations), and ``jax.grad`` is taken w.r.t. the adapter pytree alone —
the 2-bit planes are constants. B is zero-initialized (standard LoRA), so
an untrained adapter is an exact no-op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from smmb_tpu.models.lm import TernaryLMConfig, lm_forward

# adapter targets: attention projections + MLP halves of every block
_ATTN_TARGETS = ("wq", "wk", "wv", "wo")
_MLP_TARGETS = ("w_up", "w_down")


def _dims(cfg: TernaryLMConfig, name: str) -> tuple[int, int]:
    d, ff = cfg.d_model, cfg.d_ff
    kv = cfg.block.attn.kv_dim
    return {
        "wq": (d, d), "wk": (d, kv), "wv": (d, kv), "wo": (d, d),
        "w_up": (d, ff), "w_down": (ff, d),
    }[name]


def init_lora_lm(
    key: jax.Array,
    cfg: TernaryLMConfig,
    rank: int = 8,
    targets: tuple = ("wq", "wv"),
) -> list:
    """Per-block adapter pytree: ``[{name: (A, B)} ...]``.

    A ~ N(0, 1/rank) (He-style over the rank), B = 0 — the attach is an
    exact no-op until trained. Default targets (wq, wv) follow the
    original LoRA recipe; any of wq/wk/wv/wo/w_up/w_down work.
    """
    for t in targets:
        if t not in _ATTN_TARGETS + _MLP_TARGETS:
            raise ValueError(f"unknown LoRA target {t!r}")
    blocks = []
    for bk in jax.random.split(key, cfg.n_layers):
        block = {}
        for name, nk in zip(targets, jax.random.split(bk, len(targets))):
            din, dout = _dims(cfg, name)
            block[name] = (
                jax.random.normal(nk, (din, rank)) / jnp.sqrt(float(rank)),
                jnp.zeros((rank, dout)),
            )
        blocks.append(block)
    return blocks


def attach_lora(
    packed: dict, adapters: list, alpha: float = 16.0, rank: int | None = None
) -> dict:
    """Merge adapters into a packed LM pytree (returns a new pytree; the
    input is untouched). ``alpha/rank`` is the standard LoRA scaling."""
    if len(adapters) != len(packed["blocks"]):
        raise ValueError(
            f"{len(adapters)} adapter blocks vs "
            f"{len(packed['blocks'])} model blocks"
        )
    out = dict(packed)
    new_blocks = []
    for blk, ad in zip(packed["blocks"], adapters):
        nb = dict(blk)
        for name, (a, b) in ad.items():
            sc = jnp.float32(alpha / (rank if rank is not None else a.shape[1]))
            entry = (a, b, sc)
            if name in _ATTN_TARGETS:
                nb["attn"] = dict(nb["attn"])
                nb["attn"][name + "_lora"] = entry
            else:
                nb[name + "_lora"] = entry
        new_blocks.append(nb)
    out["blocks"] = new_blocks
    return out


def make_lora_train_step(
    packed: dict,
    cfg: TernaryLMConfig,
    learning_rate: float = 1e-3,
    alpha: float = 16.0,
):
    """(init_opt, train_step) training ONLY the adapters on next-token
    cross-entropy; the packed base is a frozen constant.

    ``train_step(adapters, opt_state, tokens) -> (adapters, opt_state,
    loss)``. The forward runs the jnp packed path (use_kernel=False) —
    identical math to the serving kernel, differentiable in x."""
    import optax

    tx = optax.adam(learning_rate)

    def loss_fn(adapters, tokens):
        model = attach_lora(packed, adapters, alpha=alpha)
        logits = lm_forward(model, tokens, cfg, use_kernel=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], tokens[:, 1:]
        ).mean()

    def init_opt(adapters):
        return tx.init(adapters)

    def train_step(adapters, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(adapters, tokens)
        updates, opt_state = tx.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        return adapters, opt_state, loss

    return init_opt, train_step
