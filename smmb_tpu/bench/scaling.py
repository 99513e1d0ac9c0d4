"""Multi-device scaling-efficiency harness (BASELINE.md reported points).

Measures sharded packed SpMM nnz/s at a series of mesh sizes and reports
scaling efficiency ``rate(N) / (N · rate(1))`` — the "≥85% nnz/s scaling
efficiency at 2+ hosts" metric — for all three weight partitionings:

* ``column`` — output-column sharding, no forward collective
  (parallel/sharded.py:sharded_spmm_column)
* ``row`` — K-row sharding with a ``psum`` combine
  (parallel/sharded.py:sharded_spmm_row)
* ``overlap`` — column sharding with the ring-overlapped activation
  all-gather collective matmul (parallel/overlap.py)
* ``bcsr_column`` — block-column-sharded BCSR (30% stored 128×128 blocks;
  parallel/bcsr_sharded.py — ragged block lists padded to static shapes)
* ``tp_block`` — one tensor-parallel transformer block (Megatron column/row
  pairing, two psums; parallel/tp_transformer.py) at 4096-d/8-head/4096-ff,
  rate counted over all six packed projections
* ``pp_lm`` — pipeline-parallel LM forward (GPipe microbatch schedule;
  parallel/pp_lm.py), layers = max(4, stages), rate over all block weights
* ``ep_moe`` — expert-parallel MoE (top-1 routing, one psum;
  parallel/ep_moe.py), 8 experts of 1024→4096→1024

On CI this runs on the virtual CPU mesh (numbers are not meaningful, the
machinery is what's exercised); on a real pod slice the same code reports
ICI scaling. The 1×1 point measured on a real TPU chip anchors the series.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from smmb_tpu.bench.measure import measure_device
from smmb_tpu.formats.packed import TernaryPacked, pack_ternary
from smmb_tpu.parallel.mesh import make_mesh
from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped
from smmb_tpu.parallel.sharded import (
    shard_packed_columns,
    shard_packed_rows,
    sharded_spmm_column,
    sharded_spmm_row,
)
from smmb_tpu.utils import rng

PARTITIONINGS = (
    "column", "row", "overlap", "bcsr_column", "tp_block", "pp_lm", "ep_moe"
)


@dataclasses.dataclass(frozen=True)
class ScalePoint:
    partitioning: str
    devices: int
    mesh: str
    mean_s: float
    nnz_per_s: float
    efficiency: float  # vs linear scaling from the first point


def run_scaling(
    m: int = 256,
    k: int = 4096,
    n: int = 4096,
    non_zero: int = 10,
    mesh_shapes=((1, 1), (1, 2), (1, 4), (1, 8)),
    *,
    partitioning: str = "column",
    iters: int | None = None,
    reps: int = 3,
    use_kernel: bool | None = None,
) -> list[ScalePoint]:
    """Sharded SpMM over growing model-axis meshes.

    The weight matrix is held fixed; each model shard owns its slice of the
    weight planes, so per-device work shrinks linearly and perfect scaling
    keeps walltime flat.
    """
    if partitioning not in PARTITIONINGS:
        raise ValueError(f"partitioning must be one of {PARTITIONINGS}")
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = rng.rand_dense(kx, (m, k))
    w_np = np.asarray(rng.rand_ternary(kw, (k, n), non_zero=non_zero))
    b = rng.rand_dense(kb, (n,))
    if partitioning == "bcsr_column":
        # block-sparse workload: 30% stored 128x128 blocks, ternary inside
        from smmb_tpu.formats.bcsr import bcsr_from_dense
        from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare
        from smmb_tpu.parallel.bcsr_sharded import (
            shard_bcsr_columns,
            sharded_bcsr_spmm,
        )

        km = jax.random.split(jax.random.PRNGKey(7))[0]
        bmask = np.asarray(
            jax.random.bernoulli(km, 0.3, (k // 128, n // 128))
        )
        wb_np = (
            w_np * np.repeat(np.repeat(bmask, 128, 0), 128, 1)
        ).astype(np.float32)
        prep = bcsr_prepare(bcsr_from_dense(wb_np, 128, 128))
        bcsr_nnz = int(np.count_nonzero(wb_np))
    elif partitioning == "tp_block":
        from smmb_tpu.models.transformer import (
            TernaryBlockConfig,
            init_block,
            pack_block,
        )

        # d_model=4096 keeps the row-sharded out-proj 512-group-aligned
        # up to model=8; tokens = m (batch 2 × m/2)
        bcfg = TernaryBlockConfig(d_model=4096, n_heads=8, d_ff=4096)
        bparams = init_block(jax.random.PRNGKey(4), bcfg)
        bpacked = pack_block(bparams)
        xb = rng.rand_dense(
            jax.random.PRNGKey(5), (2, m // 2, bcfg.d_model)
        ) * 0.1
        # the device packer stores nnz=-1; count from the dense masters
        blk_nnz = sum(
            int(np.count_nonzero(np.asarray(bparams["attn"][w])))
            for w in ("wq", "wk", "wv", "wo")
        ) + int(np.count_nonzero(np.asarray(bparams["w_up"]))) + int(
            np.count_nonzero(np.asarray(bparams["w_down"]))
        )
    elif partitioning == "pp_lm":
        from smmb_tpu.models.lm import TernaryLMConfig, init_lm, pack_lm

        max_stages = max(m for _, m in mesh_shapes)
        lcfg = TernaryLMConfig(
            vocab=2048, d_model=1024, n_heads=8, d_ff=4096,
            n_layers=max(4, max_stages), max_len=64,
        )
        lparams = init_lm(jax.random.PRNGKey(4), lcfg)
        lpacked = pack_lm(lparams)
        ltoks = jax.random.randint(
            jax.random.PRNGKey(5), (8, 32), 0, lcfg.vocab
        )
        lm_nnz = sum(
            int(np.count_nonzero(np.asarray(w)))
            for blk in lparams["blocks"]
            for w in (
                [blk["attn"][n] for n in ("wq", "wk", "wv", "wo")]
                + [blk["w_up"], blk["w_down"]]
            )
        )
    elif partitioning == "ep_moe":
        from smmb_tpu.models.moe import (
            TernaryMoEConfig,
            init_moe,
            pack_moe,
        )

        ecfg = TernaryMoEConfig(d_model=1024, d_ff=4096, n_experts=8)
        eparams = init_moe(jax.random.PRNGKey(4), ecfg)
        epacked = pack_moe(eparams)
        ex = rng.rand_dense(jax.random.PRNGKey(5), (m, ecfg.d_model)) * 0.5
        moe_nnz = int(np.count_nonzero(np.asarray(eparams["w_up"]))) + int(
            np.count_nonzero(np.asarray(eparams["w_down"]))
        )
    else:
        p = pack_ternary(w_np)

    points: list[ScalePoint] = []
    _base = {"rate": None, "dev": None}

    def record(ndev, label, fn, args, work):
        """Measure fn(*args), convert to nnz/s via `work`, append the point
        (shared epilogue for every partitioning branch)."""
        meas = measure_device(fn, *args, iters=iters, reps=reps)
        rate = work / meas.mean_s
        if _base["rate"] is None:
            _base["rate"], _base["dev"] = rate, ndev
        eff = rate / (_base["rate"] * ndev / _base["dev"])
        points.append(
            ScalePoint(partitioning, ndev, label, meas.mean_s, rate, eff)
        )

    for data, model in mesh_shapes:
        ndev = data * model
        label = f"{data}x{model}"
        if ndev > len(jax.devices()):
            continue
        mesh = make_mesh(data, model)
        if partitioning == "bcsr_column":
            shards = shard_bcsr_columns(prep, mesh)

            def fn(x, shards, b, _mesh=mesh):
                return sharded_bcsr_spmm(x, shards, b, mesh=_mesh)

            record(ndev, label, fn, (x, shards, b), bcsr_nnz * m)
            continue
        if partitioning == "tp_block":
            from smmb_tpu.parallel.tp_transformer import (
                block_forward_tp,
                shard_block_tp,
            )

            if (
                bcfg.attn.n_heads % model
                or bcfg.d_model % (512 * model)
                or bcfg.d_ff % (512 * model)
                or xb.shape[0] % data
            ):
                continue  # shard-alignment constraints (see tp_transformer)
            bshard = shard_block_tp(bpacked, mesh)

            def fn(xb, bshard, _mesh=mesh):
                return block_forward_tp(
                    bshard, xb, bcfg, mesh=_mesh, use_kernel=use_kernel
                )

            record(ndev, label, fn, (xb, bshard), blk_nnz * m)
            continue
        if partitioning == "pp_lm":
            from smmb_tpu.parallel.pp_lm import lm_forward_pp, shard_lm_pp

            if lcfg.n_layers % model or ltoks.shape[0] % (2 * data):
                continue  # stage/microbatch divisibility
            lshard = shard_lm_pp(lpacked, mesh)

            def fn(ltoks, lshard, _mesh=mesh):
                return lm_forward_pp(
                    lshard, ltoks, lcfg, mesh=_mesh, microbatches=2,
                    use_kernel=use_kernel,
                )

            record(ndev, label, fn, (ltoks, lshard), lm_nnz * ltoks.size)
            continue
        if partitioning == "ep_moe":
            from smmb_tpu.parallel.ep_moe import (
                moe_forward_ep,
                shard_moe_ep,
            )

            if ecfg.n_experts % model or ex.shape[0] % data:
                continue
            eshard = shard_moe_ep(epacked, mesh)

            def fn(ex, eshard, _mesh=mesh):
                return moe_forward_ep(
                    eshard, ex, ecfg, mesh=_mesh, use_kernel=use_kernel
                )

            # only ~1/E of each expert's weights are touched per token;
            # count routed-token nnz work: nnz_per_token = total/E
            record(
                ndev, label, fn, (ex, eshard),
                (moe_nnz / ecfg.n_experts) * m,
            )
            continue
        if partitioning == "row":
            ws = shard_packed_rows(p, mesh)
            spmm = sharded_spmm_row
        elif partitioning == "overlap":
            if k % (model * 512):
                continue  # K-chunk must align to packed groups
            ws = shard_packed_columns(p, mesh)
            spmm = sharded_spmm_column_overlapped
        else:
            ws = shard_packed_columns(p, mesh)
            spmm = sharded_spmm_column

        def fn(x, data_arr, b):
            w_ = TernaryPacked(data=data_arr, rows=k, cols=n, nnz=p.nnz)
            return spmm(x, w_, b, mesh=mesh, use_kernel=use_kernel)

        record(ndev, label, fn, (x, ws.data, b), p.nnz * m)
    return points


def main(argv=None):
    import argparse

    from smmb_tpu.utils.config import BenchConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--config", default=None,
        help="BenchConfig JSON file (mesh_shapes, iters, reps)",
    )
    ap.add_argument(
        "--partitionings", default=",".join(PARTITIONINGS),
        help="comma-separated subset of column,row,overlap",
    )
    ap.add_argument("--reps", type=int, default=None)
    args = ap.parse_args(argv)

    cfg = BenchConfig()
    if args.config:
        with open(args.config) as f:
            cfg = BenchConfig.from_json(f.read())
    reps = args.reps if args.reps is not None else cfg.reps
    for part in args.partitionings.split(","):
        pts = run_scaling(
            mesh_shapes=cfg.mesh_shapes,
            partitioning=part,
            iters=cfg.iters,
            reps=reps,
        )
        for pt in pts:
            print(
                f"[{pt.partitioning:7s}] devices={pt.devices:2d} "
                f"mesh={pt.mesh}  t={pt.mean_s * 1e6:9.1f}us  "
                f"nnz/s={pt.nnz_per_s:.3e}  eff={pt.efficiency * 100:5.1f}%"
            )


if __name__ == "__main__":
    main()
