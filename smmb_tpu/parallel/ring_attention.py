"""Sequence-parallel ring attention over the device mesh (net-new).

Long-context serving shards the *sequence* axis: each device owns a T/S
chunk of the tokens — Q, K, V projections run shard-locally through the
packed ternary kernel (per-token work), and attention runs as a ring:
every device holds its Q chunk fixed while the K/V chunks rotate around
the ``model`` axis with ``ppermute`` (S steps), accumulating softmax
online (running max / denominator / numerator — the numerically stable
blockwise form). Peak memory per device is O(T·D/S + (T/S)²·H) instead of
O(T²·H), and the only collectives are the S-1 KV rotations over ICI,
which XLA overlaps with the next block's score matmul.

Causality is enforced blockwise: a (q-chunk, kv-chunk) pair is fully
live, fully masked, or diagonal (elementwise mask); masked logits use a
large-negative finite (not -inf) so the online-softmax update never forms
exp(-inf − -inf).

The reference has no sequence axis at all (SURVEY.md §5 maps its absence
to the feature-axis partitioning in parallel/sharded.py); ring attention
is the transformer-era answer and completes the sp column of the
dp/tp/pp/ep/sp matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_NEG = -1e30  # finite mask value: exp(_NEG - m) underflows to 0 cleanly


def _ring_body(q, k, v, s, causal, precision, rope_theta=None, window=None):
    """Per-device online-softmax ring: q fixed, (k, v) rotate s times.

    q: (B, Tq, H, hd) local chunk; k/v: (B, Tk, KVH, hd) local chunks —
    KVH < H is grouped-query attention: the query heads group over the KV
    heads in the score/output einsums (never materialized at H), and the
    rotating chunks are KVH/H-times smaller over ICI.
    ``rope_theta`` applies rotary embeddings at each shard's GLOBAL
    positions before the ring — every device ropes its own chunk, so the
    rotating keys arrive pre-rotated (RoPE commutes with the rotation).
    Returns (B, Tq, H, hd).
    """
    b, tq, h, hd = q.shape
    kvh = k.shape[2]
    g = h // kvh
    me = jax.lax.axis_index(MODEL_AXIS)
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    perm = [(i, (i + 1) % s) for i in range(s)]

    q_pos = me * tq + jnp.arange(tq)  # global positions of my queries
    if rope_theta is not None:
        from smmb_tpu.models.attention import apply_rope

        q = apply_rope(q, q_pos, rope_theta)
        k = apply_rope(k, q_pos, rope_theta)  # my chunk: same positions

    qg = q.reshape(b, tq, kvh, g, hd)  # (B, Tq, KVH, G, hd)

    def accum(kc, vc, m, l, acc, i):
        """Fold the currently-held K/V chunk into the online softmax."""
        src = (me - i) % s  # ring owner of the chunk we currently hold
        scores = (
            jnp.einsum(
                "bqkgd,btkd->bkgqt", qg, kc,
                preferred_element_type=jnp.float32, precision=precision,
            )
            * scale
        )  # (B, KVH, G, Tq, Tk)
        if causal:
            k_pos = src * tq + jnp.arange(kc.shape[1])
            live = q_pos[:, None] >= k_pos[None, :]  # (Tq, Tk)
            if window is not None:
                live = jnp.logical_and(
                    live, q_pos[:, None] - k_pos[None, :] < window
                )
            scores = jnp.where(live[None, None, None], scores, _NEG)
        m_new = jnp.maximum(m, scores.max(axis=-1))  # (B, KVH, G, Tq)
        alpha = jnp.exp(m - m_new)  # rescale of the old accumulator
        p = jnp.exp(scores - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkgqt,btkd->bkgqd", p, vc.astype(jnp.float32),
            precision=precision,
        )
        return m_new, l, acc

    def step(carry, i):
        kc, vc, m, l, acc = carry
        m, l, acc = accum(kc, vc, m, l, acc, i)
        kc, vc = jax.lax.ppermute((kc, vc), MODEL_AXIS, perm)
        return (kc, vc, m, l, acc), None

    m0 = jnp.full((b, kvh, g, tq), _NEG, jnp.float32)
    l0 = jnp.zeros((b, kvh, g, tq), jnp.float32)
    a0 = jnp.zeros((b, kvh, g, tq, hd), jnp.float32)
    # s-1 rotated steps, then the last held chunk folds in without the
    # wasted final rotation (S-1 collectives total, as documented)
    (kc, vc, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, a0), jnp.arange(s - 1)
    )
    m, l, acc = accum(kc, vc, m, l, acc, s - 1)
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # (B, KVH, G, Tq, hd)
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(b, tq, h, hd).astype(q.dtype)
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "causal", "precision", "rope_theta")
)
def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    causal: bool = True,
    precision=None,
    rope_theta: float | None = None,
) -> jax.Array:
    """Multi-head attention with the sequence axis sharded over ``model``.

    q/k/v: (B, T, H, hd) with T sharded over the ``model`` mesh axis and B
    over ``data``; returns the attention output with the same placement.
    T must divide evenly into model-axis chunks. ``rope_theta`` applies
    rotary embeddings at global positions before the ring.
    """
    s = mesh.shape[MODEL_AXIS]

    def body(q_l, k_l, v_l):
        return _ring_body(q_l, k_l, v_l, s, causal, precision, rope_theta)

    spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel", "precision"),
)
def attention_forward_sp(
    packed: dict,
    x: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Sequence-parallel ternary attention layer: x (B, T, d_model) with T
    sharded over ``model``; packed projections (replicated — they are 2-bit)
    run shard-locally per token, attention runs as the KV ring.
    """
    from smmb_tpu.parallel.sharded import _local_spmm

    b, t, d = x.shape
    s = mesh.shape[MODEL_AXIS]
    hd = cfg.head_dim

    names = ("wq", "wk", "wv", "wo")
    arrs = {n: packed[n].data for n in names}
    for n in names:
        arrs[n + "_scale"] = packed[n + "_scale"]
        arrs[n.replace("w", "b")] = packed[n.replace("w", "b")]
    specs = {k_: P(None, None) if k_ in names else P() for k_ in arrs}
    for n in names:
        specs[n.replace("w", "b")] = P(None)

    x_spec = P(DATA_AXIS, MODEL_AXIS, None)

    def body(d_, x_l):
        bl, tl, dm = x_l.shape

        def proj(name, inp):
            return _local_spmm(
                inp.reshape(-1, inp.shape[-1]) * d_[name + "_scale"],
                d_[name], d_[name.replace("w", "b")], None,
                compute_dtype, use_kernel, dm,
            )

        q = proj("wq", x_l).reshape(bl, tl, cfg.n_heads, hd)
        k = proj("wk", x_l).reshape(bl, tl, cfg.kv_heads, hd)
        v = proj("wv", x_l).reshape(bl, tl, cfg.kv_heads, hd)
        att = _ring_body(
            q, k, v, s, cfg.causal, precision,
            rope_theta=cfg.rope_theta if cfg.rope else None,
            window=cfg.window,
        )
        y = proj("wo", att.reshape(bl, tl, dm))
        return y.reshape(bl, tl, dm)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(specs, x_spec), out_specs=x_spec,
        check_vma=False,
    )(arrs, x)
