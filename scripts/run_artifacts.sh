#!/usr/bin/env bash
# Regenerate the committed hardware artifacts (bench_out/) on the TPU chip.
# Long-running: tunnel compiles dominate the first pass; the axon compile
# server caches programs, so re-runs are warm. Run pieces individually if
# needed:
#   scripts/run_artifacts.sh showcase   # main.cpp analog, full kernel set
#   scripts/run_artifacts.sh sweep      # SparseGEMM.cpp 81-config grid
#   scripts/run_artifacts.sh mlp        # depth-4 serving + batch-1
#   scripts/run_artifacts.sh headline   # bench.py JSON line
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=bench_out
mkdir -p "$OUT"
MODE=${1:-all}

# reference sweep times 4 kernels (GEMM/sGEMM ± PReLU, SparseGEMM.cpp:149-156);
# ours adds the serving modes + the 8x8-block BCSR compatibility row
SWEEP_KERNELS="dense,dense_prelu,packed_kernel,packed_kernel_prelu,packed_kernel_bf16,packed_kernel_w2a8,bcsr"

if [[ "$MODE" == "showcase" || "$MODE" == "all" ]]; then
  echo "== showcase (main.cpp case list x full kernel registry)"
  python -m smmb_tpu showcase --csv "$OUT/showcase.csv" --plot "$OUT/showcase.png" \
    2>"$OUT/showcase.log" | tee "$OUT/showcase.txt"
fi

if [[ "$MODE" == "sweep" || "$MODE" == "all" ]]; then
  echo "== sweep (SparseGEMM.cpp 81-config grid)"
  python -m smmb_tpu sweep --kernels "$SWEEP_KERNELS" \
    --csv "$OUT/sweep.csv" --plot "$OUT/sweep.png" \
    2>"$OUT/sweep.log" | tee "$OUT/sweep.txt"
fi

if [[ "$MODE" == "mlp" || "$MODE" == "all" ]]; then
  echo "== MLP serving (BASELINE config 5)"
  { python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 256
    python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 1; } | tee "$OUT/mlp_bench.txt"
fi

if [[ "$MODE" == "headline" || "$MODE" == "all" ]]; then
  echo "== headline metric (bench.py)"
  python bench.py | tee "$OUT/headline.json"
fi
echo "artifacts in $OUT/"
