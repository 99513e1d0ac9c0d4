"""Ternary mixture-of-experts layer (net-new model family).

Switch-style top-1 routed MoE where every expert is a packed ternary FFN
(up → PReLU → down through the 2-bit Pallas SpMM) and only the tiny router
is dense. Ternary weights make MoE unusually attractive on TPU: at 2
bits/element an expert's weights are 16× smaller than fp32, so many more
experts fit in HBM per chip before expert parallelism is even needed.

TPU-first design — everything is static-shape one-hot algebra (the standard
XLA MoE recipe), no data-dependent gathers:

* router logits → top-1 expert per token, position-in-expert by prefix-sum,
  tokens beyond ``capacity`` dropped (contribute zero; callers keep the
  residual path, as in Switch Transformer).
* dispatch: ``x_e = einsum('nec,nd->ecd', mask, x)`` packs tokens into
  (experts, capacity, d_model); expert FFNs run as one ``lax.scan`` over
  the *stacked* packed expert weights (same trick as parallel/pp_lm.py);
  combine is the transposed einsum weighted by the router gate.

Expert parallelism lives in parallel/ep_moe.py: experts sharded over the
``model`` mesh axis, one psum to combine.

No reference analog (the reference stops at single dense-ternary layers,
SURVEY.md §5); this extends the framework's serving story the same way
models/lm.py does.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smmb_tpu.formats.packed import pack_ternary_device
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops.spmm import packed_spmm_jnp
from smmb_tpu.utils import rng


@dataclasses.dataclass(frozen=True)
class TernaryMoEConfig:
    d_model: int
    d_ff: int  # per-expert hidden width
    n_experts: int
    capacity_factor: float = 1.25
    alpha: float = 0.2
    non_zero: int = 2
    top_k: int = 1  # experts per token (1 = Switch, 2 = Mixtral-style)

    def capacity(self, n_tokens: int) -> int:
        """Per-expert token slots, padded to the sublane multiple (8).
        Scales with ``top_k`` (k assignments per token share the slots)."""
        cap = int(
            self.capacity_factor * self.top_k * n_tokens / self.n_experts
        )
        return max(8, -(-cap // 8) * 8)


def init_moe(key: jax.Array, cfg: TernaryMoEConfig) -> dict:
    """Dense router + stacked ternary expert masters (E, D, F)/(E, F, D)."""
    kr, ku, kd, kbu, kbd = jax.random.split(key, 5)
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.d_model))
    return {
        "router": rng.rand_dense(kr, (cfg.d_model, cfg.n_experts)) * scale,
        "w_up": jnp.stack([
            rng.rand_ternary(k, (cfg.d_model, cfg.d_ff), non_zero=cfg.non_zero)
            for k in jax.random.split(ku, cfg.n_experts)
        ]),
        "b_up": rng.rand_dense(kbu, (cfg.n_experts, cfg.d_ff)) * 0.1,
        "w_down": jnp.stack([
            rng.rand_ternary(k, (cfg.d_ff, cfg.d_model), non_zero=cfg.non_zero)
            for k in jax.random.split(kd, cfg.n_experts)
        ]),
        "b_down": rng.rand_dense(kbd, (cfg.n_experts, cfg.d_model)) * 0.1,
    }


def pack_moe(params: dict, quantize: bool = False) -> dict:
    """Expert masters → stacked 2-bit packed serving weights.

    Leaves are stacked on a leading expert axis (TernaryPacked.data becomes
    (E, K/4, N)) so expert compute is a ``lax.scan`` over the stack —
    identical static meta per expert makes the stack a valid pytree.
    """
    from smmb_tpu.models.train import absmean_scale, ternarize_ste

    def pack_stack(ws):
        packs, scales = [], []
        for e in range(ws.shape[0]):
            w = ws[e]
            if quantize:
                packs.append(pack_ternary_device(ternarize_ste(w)))
                scales.append(absmean_scale(w))
            else:
                packs.append(pack_ternary_device(w))
                scales.append(jnp.float32(1.0))
        return (
            jax.tree.map(lambda *xs: jnp.stack(xs), *packs),
            jnp.stack(scales),
        )

    w_up, s_up = pack_stack(params["w_up"])
    w_down, s_down = pack_stack(params["w_down"])
    return {
        "router": params["router"],
        "w_up": w_up, "s_up": s_up, "b_up": params["b_up"],
        "w_down": w_down, "s_down": s_down, "b_down": params["b_down"],
    }


def route_top1(router_logits: jax.Array, capacity: int):
    """Top-1 dispatch/combine tensors from (N, E) logits.

    Returns (dispatch (N, E, C) one-hot, combine (N, E, C) gate-weighted).
    Position within each expert is assigned in token order (prefix-sum of
    the expert one-hot); tokens past ``capacity`` are dropped (all-zero
    rows — they contribute nothing and the caller's residual carries them).
    """
    n, e = router_logits.shape
    gates = jax.nn.softmax(router_logits, axis=-1)
    expert = jnp.argmax(gates, axis=-1)  # (N,)
    onehot = jax.nn.one_hot(expert, e, dtype=router_logits.dtype)  # (N, E)
    pos = jnp.cumsum(onehot, axis=0) - onehot  # tokens before me, my expert
    pos = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # (N,)
    keep = pos < capacity
    poshot = jax.nn.one_hot(pos, capacity, dtype=router_logits.dtype)
    dispatch = onehot[:, :, None] * poshot[:, None, :]  # (N, E, C)
    dispatch = dispatch * keep[:, None, None]
    gate = jnp.sum(gates * onehot, axis=-1)  # (N,) top-1 gate value
    combine = dispatch * gate[:, None, None]
    return dispatch, combine


def route_topk(router_logits: jax.Array, capacity: int, k: int):
    """Top-k dispatch/combine tensors from (N, E) logits (GShard-style).

    Each token routes to its k highest-gate experts with the gates
    renormalized over the chosen k (the Mixtral recipe). NOTE: at k=1 the
    renormalization forces every combine weight to 1.0, which is NOT
    ``route_top1``'s semantics (Switch scales by the raw gate probability,
    keeping the router in the gradient path) — that is why ``_route``
    dispatches k=1 to ``route_top1``. Slot
    assignment is rank-major: every token's rank-0 choice claims expert
    slots first, then rank-1, ... — lower-rank (higher-gate) assignments
    survive capacity pressure, matching GShard's priority semantics.
    Returns (dispatch (N, E, C) multi-hot, combine (N, E, C))."""
    n, e = router_logits.shape
    gates = jax.nn.softmax(router_logits, axis=-1)
    topv, topi = jax.lax.top_k(gates, k)  # (N, k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    counts = jnp.zeros((e,), router_logits.dtype)  # slots claimed so far
    dispatch = jnp.zeros((n, e, capacity), router_logits.dtype)
    combine = jnp.zeros_like(dispatch)
    for r in range(k):  # k is small and static — unrolled under jit
        onehot = jax.nn.one_hot(topi[:, r], e, dtype=router_logits.dtype)
        pos = (jnp.cumsum(onehot, axis=0) - onehot) + counts[None, :]
        pos = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # (N,)
        keep = pos < capacity
        poshot = jax.nn.one_hot(pos, capacity, dtype=router_logits.dtype)
        d_r = onehot[:, :, None] * poshot[:, None, :] * keep[:, None, None]
        dispatch = dispatch + d_r
        combine = combine + d_r * topv[:, r][:, None, None]
        counts = counts + jnp.sum(onehot, axis=0)
    return dispatch, combine


def _route(router_logits: jax.Array, capacity: int, top_k: int):
    """Config-driven dispatch: Switch top-1 (raw gate) or GShard top-k."""
    if top_k == 1:
        return route_top1(router_logits, capacity)
    return route_topk(router_logits, capacity, top_k)


def load_balance_loss(router_logits: jax.Array):
    """Switch-Transformer auxiliary loss: E · Σ_e f_e · P_e, minimized at
    uniform routing. f_e is the *pre-capacity* routed fraction (argmax
    assignments, as in the Switch recipe — using post-drop dispatch would
    cap an overloaded expert's penalty exactly when balancing matters
    most); P_e is the mean router probability. Differentiable through P
    only — f's argmax is a constant."""
    e = router_logits.shape[-1]
    probs = jax.nn.softmax(router_logits, axis=-1)  # (N, E)
    f = jax.nn.one_hot(
        jnp.argmax(router_logits, axis=-1), e, dtype=probs.dtype
    ).mean(axis=0)
    p = probs.mean(axis=0)
    return e * jnp.sum(jax.lax.stop_gradient(f) * p)


def qat_moe_forward(params: dict, x: jax.Array, cfg: TernaryMoEConfig):
    """Training forward on master weights: STE-ternarized experts around
    the same routing as serving. Returns (y, aux_loss) — add
    ``aux_weight·aux`` to the task loss to keep experts balanced."""
    from smmb_tpu.models.train import absmean_scale, ternarize_ste
    from smmb_tpu.ops.dense import prelu

    hi = jax.lax.Precision.HIGHEST
    n = x.shape[0]
    cap = cfg.capacity(n)
    logits = jnp.dot(x, params["router"], precision=hi)
    dispatch, combine = _route(logits, cap, cfg.top_k)
    x_e = jnp.einsum("nec,nd->ecd", dispatch, x, precision=hi)

    def body(carry, inp):
        x_slab, wu, bu, wd, bd = inp
        wuq = ternarize_ste(wu) * absmean_scale(wu)
        h = prelu(
            jnp.dot(x_slab, wuq, preferred_element_type=jnp.float32) + bu,
            cfg.alpha,
        )
        wdq = ternarize_ste(wd) * absmean_scale(wd)
        y = jnp.dot(h, wdq, preferred_element_type=jnp.float32) + bd
        return carry, y

    _, y_e = jax.lax.scan(
        body, None,
        (x_e, params["w_up"], params["b_up"],
         params["w_down"], params["b_down"]),
    )
    y = jnp.einsum("nec,ecd->nd", combine, y_e, precision=hi)
    return y, load_balance_loss(logits)


def make_moe_train_step(
    cfg: TernaryMoEConfig,
    learning_rate: float = 1e-3,
    aux_weight: float = 1e-2,
):
    """(init_opt, train_step) for MSE regression on the routed ternary MoE;
    ``train_step(params, opt_state, x, y) -> (params, opt_state, loss)``."""
    import optax

    tx = optax.adam(learning_rate)

    def loss_fn(params, x, y):
        pred, aux = qat_moe_forward(params, x, cfg)
        return jnp.mean((pred - y) ** 2) + aux_weight * aux

    def init_opt(params):
        return tx.init(params)

    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, train_step


def _expert_ffn(x_e, w_up, s_up, b_up, w_down, s_down, b_down, alpha,
                compute_dtype, use_kernel):
    """One expert's packed FFN on its (C, D) token slab."""
    if use_kernel:
        h = packed_spmm(
            x_e * s_up, w_up, b_up, alpha, compute_dtype=compute_dtype
        )
        return packed_spmm(
            h * s_down, w_down, b_down, compute_dtype=compute_dtype
        )
    h = packed_spmm_jnp(x_e * s_up, w_up, b_up, alpha, dtype=compute_dtype)
    return packed_spmm_jnp(h * s_down, w_down, b_down, dtype=compute_dtype)


def moe_forward(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMoEConfig,
    *,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    no_drop: bool = False,
) -> jax.Array:
    """Single-device routed forward: (N, d_model) → (N, d_model).

    (For (B, T, D) inputs flatten to (B·T, D) first — routing is
    per-token.)

    ``no_drop=True`` sizes capacity so NO token can overflow (worst case:
    every token routes to the same expert — N slots; top_k picks DISTINCT
    experts per token, so an expert receives at most one assignment per
    token regardless of k). This is the SERVING mode: capacity-competitive
    routing is not causal (whether a token drops depends on the other
    tokens in the call, so decode would disagree with prefill); drop-free
    routing makes every token's expert output independent of its
    neighbors, which is what gives the MoE LM exact decode-vs-forward
    parity. Training keeps the competitive Switch capacity (the standard
    train-compete/serve-dense split); the cost is a C=N dispatch tensor
    (quadratic in call size), so long prompts should prefill in chunks —
    ``generate(..., prefill_chunk=C)`` / models/lm.lm_prefill_chunked.
    """
    n, d = x.shape
    if no_drop:
        cap = max(8, -(-n // 8) * 8)
    else:
        cap = cfg.capacity(n)
    # HIGHEST on the routing/dispatch matmuls: they are one-hot selections
    # (must move activations exactly, not bf16-rounded — the TPU default
    # single-pass-bf16 costs 5e-3 rel err end to end) and a tiny fraction
    # of the layer's FLOPs; the expert FFNs stay on the fast path.
    hi = jax.lax.Precision.HIGHEST
    logits = jnp.dot(x, packed["router"], precision=hi)
    dispatch, combine = _route(logits, cap, cfg.top_k)
    x_e = jnp.einsum("nec,nd->ecd", dispatch, x, precision=hi)  # (E, C, D)

    # scan pairs each expert's token slab with its packed weights — both
    # carry the leading E axis
    def body(carry, inp):
        x_slab, (w_up, s_up, b_up, w_down, s_down, b_down) = inp
        y = _expert_ffn(
            x_slab, w_up, s_up, b_up, w_down, s_down, b_down,
            cfg.alpha, compute_dtype, use_kernel,
        )
        return carry, y

    stack = (
        packed["w_up"], packed["s_up"], packed["b_up"],
        packed["w_down"], packed["s_down"], packed["b_down"],
    )
    _, y_e = jax.lax.scan(body, None, (x_e, stack))  # (E, C, D)
    return jnp.einsum(
        "nec,ecd->nd", combine, y_e.astype(x.dtype), precision=hi
    )
