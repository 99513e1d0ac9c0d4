"""Worker for the REAL multi-process multihost parity test.

Launched (2×) by tests/test_multihost.py with JAX_PLATFORMS=cpu and 2
virtual CPU devices per process: ``jax.distributed.initialize`` connects
the processes into one 4-device JAX runtime, and the same sharded
programs that serve a pod slice run over the cross-process mesh —
exercising exactly the seams a single-process virtual mesh cannot
(SURVEY.md §4's multi-host prescription; round-3 VERDICT missing #2):
global-vs-local device lists, cross-process collectives (the row-parallel
psum), per-process shard placement, and primary-host-only artifact
conventions (multihost.is_primary).

    python scripts/multihost_worker.py --process-id 0 --num-processes 2 \
        --coordinator localhost:12345
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    args = ap.parse_args()

    import jax

    from smmb_tpu.parallel.multihost import initialize_multihost, is_primary

    info = initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(f"[p{args.process_id}] initialized: {info}", flush=True)
    assert info["process_count"] == args.num_processes, info
    assert info["global_devices"] == info["local_devices"] * args.num_processes, (
        "global device list must span all processes", info,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smmb_tpu.formats.packed import pack_ternary
    from smmb_tpu.ops.spmm import packed_spmm_jnp
    from smmb_tpu.parallel.mesh import make_mesh
    from smmb_tpu.parallel.sharded import (
        shard_packed_columns,
        shard_packed_rows,
        sharded_spmm_column,
        sharded_spmm_row,
    )
    from smmb_tpu.utils import rng

    mesh = make_mesh(1, model=info["global_devices"])

    def full_host(y):
        # replicate across the mesh (a cross-process all-gather under jit)
        # so the value becomes fully addressable on every process
        rep_sh = NamedSharding(mesh, P(*([None] * y.ndim)))
        return np.asarray(jax.jit(lambda a: a, out_shardings=rep_sh)(y))

    # deterministic inputs — every process builds the same host values
    # (K = model_size × GROUP_ROWS packed groups so row-sharding aligns)
    # N must split into 128-multiple column shards across the global mesh
    M, K, N = 16, 512 * info["global_devices"], 128 * info["global_devices"]
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x_h = np.asarray(rng.rand_dense(kx, (M, K)))
    w_h = np.asarray(rng.rand_ternary(kw, (K, N), non_zero=4))
    b_h = np.asarray(rng.rand_dense(kb, (N,)))
    w = pack_ternary(w_h)
    ref = np.asarray(packed_spmm_jnp(x_h, w, b_h, dtype=jnp.float32))

    rep = NamedSharding(mesh, P())
    x = jax.device_put(jnp.asarray(x_h), rep)
    b = jax.device_put(jnp.asarray(b_h), rep)

    # 1) column-parallel: per-shard output panels, no forward collective
    wc = shard_packed_columns(w, mesh)
    yc = sharded_spmm_column(x, wc, b, mesh=mesh, use_kernel=False)
    np.testing.assert_allclose(full_host(yc), ref, atol=1e-4, rtol=1e-5)
    print(f"[p{args.process_id}] PASS_COLUMN", flush=True)

    # 2) row(K)-parallel: partial products combined by a CROSS-PROCESS psum
    wr = shard_packed_rows(w, mesh)
    yr = sharded_spmm_row(x, wr, b, mesh=mesh, use_kernel=False)
    np.testing.assert_allclose(full_host(yr), ref, atol=1e-4, rtol=1e-5)
    print(f"[p{args.process_id}] PASS_ROW", flush=True)

    def participates(mesh_devices):
        """Only processes owning devices of a subset mesh may run (and must
        all run) computations on it — gate each subset-mesh stage on
        membership, the production pattern for per-group meshes."""
        return any(
            d.process_index == args.process_id for d in mesh_devices
        )

    # 3) one TP transformer block over the cross-process mesh
    from smmb_tpu.models.transformer import (
        TernaryBlockConfig,
        block_forward,
        init_block,
        pack_block,
    )
    from smmb_tpu.parallel.tp_transformer import (
        block_forward_tp,
        shard_block_tp,
    )

    # a DELIBERATELY cross-process 2-device model mesh: one device from
    # each process (jax.devices() lists process 0's first), so every TP
    # collective in the block crosses the process boundary. d_model=1024
    # satisfies shard_packed_rows' K = model×512 alignment for wo.
    devs = jax.devices()
    bdevs = [devs[0], devs[info["local_devices"]]]
    bmesh = make_mesh(1, model=2, devices=bdevs)
    cfg = TernaryBlockConfig(d_model=1024, n_heads=4, d_ff=2048)
    if participates(bdevs):
        params = init_block(jax.random.PRNGKey(1), cfg)
        packed = pack_block(params)
        xb_h = np.asarray(
            rng.rand_dense(jax.random.PRNGKey(2), (2, 4, 1024))
        ) * 0.1
        block_ref = np.asarray(
            block_forward(packed, jnp.asarray(xb_h), cfg, use_kernel=False)
        )
        sharded = shard_block_tp(packed, bmesh)
        xb = jax.device_put(jnp.asarray(xb_h), NamedSharding(bmesh, P()))
        yb = block_forward_tp(sharded, xb, cfg, mesh=bmesh, use_kernel=False)
        rep_b = NamedSharding(bmesh, P(*([None] * yb.ndim)))
        yb_full = np.asarray(jax.jit(lambda a: a, out_shardings=rep_b)(yb))
        np.testing.assert_allclose(yb_full, block_ref, atol=5e-3, rtol=1e-4)
        print(f"[p{args.process_id}] PASS_BLOCK", flush=True)

    if args.num_processes >= 4:
        # 4) ring-overlap collective matmul with ONE device per process:
        # every ppermute hop of the ring crosses a process boundary
        # (round-5, VERDICT r4 #10)
        from smmb_tpu.parallel.overlap import sharded_spmm_column_overlapped

        npr = args.num_processes
        rdevs = [devs[i * info["local_devices"]] for i in range(npr)]
        rmesh = make_mesh(1, model=npr, devices=rdevs)
        kr = 512 * npr
        kx2, kw2, kb2 = jax.random.split(jax.random.PRNGKey(3), 3)
        xr_h = np.asarray(rng.rand_dense(kx2, (8, kr)))
        wr_h = np.asarray(rng.rand_ternary(kw2, (kr, 512), non_zero=4))
        br_h = np.asarray(rng.rand_dense(kb2, (512,)))
        wrp = pack_ternary(wr_h)
        ref_r = np.asarray(packed_spmm_jnp(xr_h, wrp, br_h, dtype=jnp.float32))
        wrc = shard_packed_columns(wrp, rmesh)
        xr = jax.device_put(jnp.asarray(xr_h), NamedSharding(rmesh, P()))
        br = jax.device_put(jnp.asarray(br_h), NamedSharding(rmesh, P()))
        yr2 = sharded_spmm_column_overlapped(
            xr, wrc, br, mesh=rmesh, use_kernel=False
        )
        rep_r = NamedSharding(rmesh, P(*([None] * yr2.ndim)))
        yr2_full = np.asarray(jax.jit(lambda a: a, out_shardings=rep_r)(yr2))
        np.testing.assert_allclose(yr2_full, ref_r, atol=1e-4, rtol=1e-5)
        print(f"[p{args.process_id}] PASS_RING", flush=True)

        # 5) pipeline-parallel LM with its two stages on DIFFERENT
        # processes: the stage-boundary ppermute crosses processes
        from smmb_tpu.models.lm import (
            TernaryLMConfig,
            init_lm,
            lm_forward,
            pack_lm,
        )
        from smmb_tpu.parallel.pp_lm import lm_forward_pp, shard_lm_pp

        pdevs = [devs[0], devs[2 * info["local_devices"]]]
        if not participates(pdevs):
            print(f"MULTIHOST_OK process {args.process_id}", flush=True)
            return
        pmesh = make_mesh(1, model=2, devices=pdevs)
        cfgp = TernaryLMConfig(
            vocab=128, d_model=256, n_heads=2, d_ff=512, n_layers=2,
            max_len=16,
        )
        lmp = pack_lm(init_lm(jax.random.PRNGKey(4), cfgp))
        toks_h = np.asarray(
            jax.random.randint(jax.random.PRNGKey(5), (4, 6), 0, cfgp.vocab)
        )
        ref_p = np.asarray(
            lm_forward(lmp, jnp.asarray(toks_h), cfgp, use_kernel=False)
        )
        shp = shard_lm_pp(lmp, pmesh)
        toks = jax.device_put(jnp.asarray(toks_h), NamedSharding(pmesh, P()))
        yp = lm_forward_pp(
            shp, toks, cfgp, mesh=pmesh, microbatches=2, use_kernel=False
        )
        rep_p = NamedSharding(pmesh, P(*([None] * yp.ndim)))
        yp_full = np.asarray(jax.jit(lambda a: a, out_shardings=rep_p)(yp))
        tol = max(1e-4, 2e-5 * float(np.abs(ref_p).max()))
        np.testing.assert_allclose(yp_full, ref_p, atol=tol, rtol=1e-4)
        print(f"[p{args.process_id}] PASS_PP", flush=True)

    if is_primary():
        print("PRIMARY_OK", flush=True)
    print(f"MULTIHOST_OK process {args.process_id}", flush=True)


if __name__ == "__main__":
    main()
