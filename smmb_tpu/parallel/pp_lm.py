"""Pipeline-parallel ternary LM forward over the device mesh (net-new).

GPipe-style schedule: the LM's blocks are split into S contiguous stages
over the ``model`` mesh axis; a batch is cut into U microbatches that flow
through the pipe, activations handed stage-to-stage with ``ppermute`` over
ICI. The whole pipe is one ``shard_map`` whose per-tick body runs the
stage's blocks with ``lax.scan`` over their *stacked* packed weights —
static shapes throughout, so the per-device compute is the unchanged
single-chip packed Pallas kernel.

This completes the parallelism matrix next to data parallelism (batch
axis), tensor parallelism (parallel/tp_transformer.py), and the
feature-axis column/row partitionings (parallel/sharded.py). The reference
has no distributed layer at all (SURVEY.md §2 checklist); pipeline
parallelism is the standard way to serve models whose weights exceed one
chip's HBM — for 2-bit ternary weights that is ~64 B parameters on a 16 GB
v5e, and beyond that the pipe is the natural axis.

Schedule cost: U + S - 1 ticks for U microbatches — efficiency U/(U+S-1);
pick U ≥ 4·S to keep bubble overhead under ~20%.

Constraints: ``n_layers % S == 0`` (equal stages), all blocks identically
shaped (required for weight stacking), ``batch % (U · data) == 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smmb_tpu.models.transformer import rmsnorm
from smmb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _stage_count(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def stack_blocks(blocks: list) -> dict:
    """Stack L identically-shaped packed block pytrees along a new leading
    axis (every leaf becomes (L, ...)); static TernaryPacked meta must agree
    across layers (the device packer's nnz=-1 sentinel guarantees this)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def shard_lm_pp(packed: dict, mesh: Mesh) -> dict:
    """Place a packed LM (models/lm.pack_lm) for pipeline parallelism:
    blocks stacked and stage-sharded on the leading axis over ``model``;
    embeddings and head replicated (they run outside the pipe)."""
    s = _stage_count(mesh)
    n_layers = len(packed["blocks"])
    if n_layers % s:
        raise ValueError(f"n_layers={n_layers} % stages={s} != 0")
    stacked = stack_blocks(packed["blocks"])
    stage_sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(MODEL_AXIS))),
        stacked,
    )
    repl = NamedSharding(mesh, P())
    return {
        "embed": jax.device_put(packed["embed"], repl),
        "pos": jax.device_put(packed["pos"], repl),
        "blocks_stacked": stage_sharded,
        "norm_f": jax.device_put(packed["norm_f"], repl),
        "head": packed["head"],
        "head_scale": jax.device_put(packed["head_scale"], repl),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "microbatches", "compute_dtype", "use_kernel",
        "precision",
    ),
)
def lm_forward_pp(
    packed: dict,
    tokens: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    microbatches: int = 4,
    compute_dtype=jnp.float32,
    use_kernel: bool = True,
    precision=None,
) -> jax.Array:
    """Pipeline-parallel LM forward: (B, T) tokens → (B, T, vocab) logits.

    Embedding and LM head run replicated outside the pipe (they are the
    tiny dense remainder); the S-stage block pipe runs U microbatches in
    U + S - 1 ticks inside one shard_map.
    """
    s = _stage_count(mesh)
    u = microbatches
    b, t = tokens.shape
    if b % u:
        raise ValueError(f"batch={b} % microbatches={u} != 0")
    mb = b // u

    x = packed["embed"][tokens] + packed["pos"][None, :t]
    xs = x.reshape(u, mb, t, cfg.d_model)

    blk_specs = jax.tree.map(
        lambda _: P(MODEL_AXIS), packed["blocks_stacked"]
    )

    def pipe_body(blocks_local, xs):
        stage = jax.lax.axis_index(MODEL_AXIS)

        def run_stage(h):
            def one_block(h, bp):
                # cfg._blk dispatches dense vs MoE blocks — the pipeline
                # schedule is architecture-agnostic (MoE block pytrees
                # stack the same way: tree leaves gain the layer axis)
                return (
                    cfg._blk["forward"](
                        bp, h, cfg.block,
                        compute_dtype=compute_dtype, use_kernel=use_kernel,
                        precision=precision,
                    ),
                    None,
                )

            h, _ = jax.lax.scan(one_block, h, blocks_local)
            return h

        def tick(carry, i):
            buf, outs = carry
            # stage 0 injects microbatch i (clamped; masked out past U)
            x_in = xs[jnp.clip(i, 0, u - 1)]
            buf = jnp.where(stage == 0, x_in, buf)
            h = run_stage(buf)
            # last stage collects finished microbatch j = i - (S - 1)
            j = i - (s - 1)
            take = jnp.logical_and(stage == s - 1, j >= 0)
            slot = jnp.clip(j, 0, u - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, h, cur), slot, 0
            )
            # hand activations to the next stage over ICI
            buf = jax.lax.ppermute(
                h, MODEL_AXIS, [(k, (k + 1) % s) for k in range(s)]
            )
            return (buf, outs), None

        buf = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)
        (buf, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(u + s - 1)
        )
        # outs is populated only on the last stage (zeros elsewhere);
        # psum replicates the result across the pipe
        return jax.lax.psum(
            jnp.where(stage == s - 1, outs, jnp.zeros_like(outs)),
            MODEL_AXIS,
        )

    ys = jax.shard_map(
        pipe_body,
        mesh=mesh,
        in_specs=(blk_specs, P(None, DATA_AXIS, None, None)),
        out_specs=P(None, DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma info yet
    )(packed["blocks_stacked"], xs)

    from smmb_tpu.models.lm import _head_logits

    h = rmsnorm(ys.reshape(b, t, cfg.d_model), packed["norm_f"], cfg.eps)
    return _head_logits(packed, h, cfg, compute_dtype, use_kernel)
