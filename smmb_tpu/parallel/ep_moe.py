"""Expert-parallel ternary MoE over the device mesh (net-new).

Experts (models/moe.py) shard over the ``model`` mesh axis on their stacked
leading dimension — each device owns E/model whole experts, 2-bit packed.
Tokens stay data-sharded; every device routes its own tokens against the
(replicated, tiny) router, computes slabs only for the experts it owns, and
one ``psum`` over ``model`` assembles the combined outputs. That is the
whole collective cost: routing metadata is recomputed shard-locally from
replicated logits instead of being exchanged (cheap — it is O(N·E) one-hot
algebra, vs the all-to-all a token-exchanging design would need).

Completes the parallelism matrix: dp (batch), tp (tp_transformer.py),
pp (pp_lm.py), feature col/row (sharded.py), and now ep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.models.moe import TernaryMoEConfig, _expert_ffn, _route
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _model_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def ep_ffn_body(
    x_l, router, stack, cfg: TernaryMoEConfig, e_loc: int, cap: int,
    compute_dtype, use_kernel: bool,
):
    """Shard-local expert-parallel MoE application (inside shard_map):
    route ALL local tokens against the replicated router, compute slabs
    for the experts this shard owns, psum the combine over ``model``.
    Shared by the standalone EP layer and the TP-EP MoE block
    (parallel/tp_moe.py). HIGHEST on routing/dispatch: one-hot selections
    must move activations exactly (see models/moe.moe_forward)."""
    hi = jax.lax.Precision.HIGHEST
    logits = jnp.dot(x_l, router, precision=hi)
    dispatch, combine = _route(logits, cap, cfg.top_k)
    off = jax.lax.axis_index(MODEL_AXIS) * e_loc
    disp_l = jax.lax.dynamic_slice_in_dim(dispatch, off, e_loc, axis=1)
    comb_l = jax.lax.dynamic_slice_in_dim(combine, off, e_loc, axis=1)
    x_e = jnp.einsum("nec,nd->ecd", disp_l, x_l, precision=hi)

    def one(carry, inp):
        x_slab, (w_up, s_up, b_up, w_down, s_down, b_down) = inp
        y = _expert_ffn(
            x_slab, w_up, s_up, b_up, w_down, s_down, b_down,
            cfg.alpha, compute_dtype, use_kernel,
        )
        return carry, y

    _, y_e = jax.lax.scan(one, None, (x_e, stack))
    y_part = jnp.einsum(
        "nec,ecd->nd", comb_l, y_e.astype(x_l.dtype), precision=hi
    )
    return jax.lax.psum(y_part, MODEL_AXIS)


def shard_moe_ep(packed: dict, mesh: Mesh) -> dict:
    """Place a packed MoE (models/moe.pack_moe) expert-parallel: every
    expert-stacked leaf sharded on its leading E axis; router replicated."""
    ms = _model_size(mesh)
    e = packed["b_up"].shape[0]
    if e % ms:
        raise ValueError(f"n_experts={e} % model={ms} != 0")
    exp = NamedSharding(mesh, P(MODEL_AXIS))
    out = {
        "router": jax.device_put(
            packed["router"], NamedSharding(mesh, P(None, None))
        )
    }
    for k in ("w_up", "s_up", "b_up", "w_down", "s_down", "b_down"):
        out[k] = jax.tree.map(lambda a: jax.device_put(a, exp), packed[k])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "compute_dtype", "use_kernel"),
)
def moe_forward_ep(
    packed: dict,
    x: jax.Array,
    cfg: TernaryMoEConfig,
    *,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
) -> jax.Array:
    """Expert-parallel routed forward: x (N, d_model) data-sharded →
    y (N, d_model) with the same placement. One psum over ``model``."""
    ms = _model_size(mesh)
    e_loc = cfg.n_experts // ms
    n = x.shape[0]
    # capacity follows the *local* token count (the routing each shard
    # computes is over its own tokens, matching the single-device layer
    # applied per data shard)
    data = mesh.shape[DATA_AXIS]
    cap = cfg.capacity(n // data)

    stack_keys = ("w_up", "s_up", "b_up", "w_down", "s_down", "b_down")
    arrs = {k: packed[k] for k in stack_keys}
    arrs["router"] = packed["router"]
    specs = {
        k: jax.tree.map(lambda _: P(MODEL_AXIS), arrs[k])
        for k in stack_keys
    }
    specs["router"] = P(None, None)

    def body(d, x_l):
        stack = tuple(d[k] for k in stack_keys)
        return ep_ffn_body(
            x_l, d["router"], stack, cfg, e_loc, cap,
            compute_dtype, use_kernel,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(arrs, x)
