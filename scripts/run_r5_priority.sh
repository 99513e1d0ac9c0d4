#!/usr/bin/env bash
# Round-5 PRIORITIZED hardware batch: same invariants as run_r5_hw.sh
# (validate gates timing; artifacts stamped with the clean HEAD they
# measured), but ordered so the judge-critical round-5 artifacts land
# first if wall-clock runs out:
#   1. parity gates + headline (fast)
#   2. kvq_crossover  — VERDICT r4 #1 done-criterion artifact
#   3. decode benches — VERDICT r4 #3 (frac_decode_sol column)
#   4. capacity sweep — VERDICT r4 #4 (the reference's ORIGINAL grid)
#   5. spec_win       — VERDICT r4 #2 (batch-8 spec-decode artifact)
#   6. everything else (sweep chunks, showcase, profile, ...)
#
#   bash scripts/run_r5_priority.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out
LOG=bench_out/r5_hw.log

run() { # name timeout cmd...
  local name=$1 to=$2 rc; shift 2
  local HEAD
  HEAD=$(git rev-parse --short=12 HEAD)
  echo "=== $name ($(date +%T)) ===" | tee -a "$LOG"
  timeout "$to" "$@" > bench_out/"$name".txt 2>&1
  rc=$?
  if grep -q "^\[stamp\] git=" bench_out/"$name".txt; then
    if ! grep -q "^\[stamp\] git=$HEAD " bench_out/"$name".txt; then
      echo "STAMP MISMATCH: artifact $name stamped $(grep -o 'git=[^ ]*' \
        bench_out/"$name".txt | head -1), HEAD is $HEAD — discarding" \
        | tee -a "$LOG"
      echo "INVALID: stamp mismatch (measured code != HEAD $HEAD)" \
        > bench_out/"$name".txt
      return 1
    fi
  fi
  echo "--- $name exit=$rc (124=timeout) ---" | tee -a "$LOG"
  return $rc
}

if [ -n "$(git status --porcelain --untracked-files=no -- smmb_tpu scripts bench.py __graft_entry__.py tests)" ]; then
  echo "REFUSING to run: working tree is dirty — commit first so artifacts"
  echo "describe a commit."
  exit 1
fi

# ---- phase 1: gates + headline --------------------------------------
VF_OK=0; VL_OK=0
run verify_flash 900 python scripts/verify_flash.py && VF_OK=1
run verify_lm 1200 python scripts/verify_lm.py && VL_OK=1
run headline 900 python bench.py
run headline_run2 600 python bench.py
run headline_run3 600 python bench.py

# ---- phase 2: the VERDICT #1 artifact -------------------------------
if [ "$VL_OK" = 1 ]; then
  run kvq_crossover 2700 python scripts/bench_kvq_crossover.py
else
  echo "INVALID: verify_lm failed parity; no timing published" \
    > bench_out/kvq_crossover.txt
fi

# ---- phase 3: decode + flash timing ---------------------------------
if [ "$VL_OK" = 1 ]; then
  run decode_bench 900 python -m smmb_tpu decode
  run decode_flash 900 python -m smmb_tpu decode --flash
  run lm_bench 900 python -m smmb_tpu lm --steps 64
fi
if [ "$VF_OK" = 1 ]; then
  run bench_flash 1500 python scripts/bench_flash.py
fi

# ---- phase 4: capacity-scale sweep (reference's ORIGINAL grid) ------
run sweep_large 3600 python -m smmb_tpu capacity --reps 3 \
  --csv bench_out/sweep_large.csv --plot bench_out/sweep_large.png

# ---- phase 5: spec decode win + flash-decode parity -----------------
if [ "$VL_OK" = 1 ]; then
  run spec_win 3600 python scripts/bench_spec_win.py
  run verify_flash_decode 2400 python scripts/verify_flash_decode.py
fi

# ---- phase 6: sweep grid (alpha=0.25, dispatch column; resumable) ---
rm -f bench_out/sweep_part_nz*_m*.csv
bash scripts/run_sweep_chunks.sh 2>&1 | tee -a "$LOG" | tail -5

# ---- phase 7: showcase + the rest -----------------------------------
run showcase 5400 python -m smmb_tpu showcase \
  --csv bench_out/showcase.csv --plot bench_out/showcase.png
if [ "$VL_OK" = 1 ]; then
  run batch_decode 3000 python scripts/probe_batch_decode.py
  run quant_batch 1500 python scripts/probe_quant_batch.py
  run profile 2400 python scripts/profile_kernels.py
fi
run mlp_bench 1200 bash -c \
  "python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 256 && \
   python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 1"
run scaling_tpu_1x1 1500 python -m smmb_tpu scaling

python scripts/check_docs.py | tee -a "$LOG"
echo "BATCH DONE $(date +%T)" | tee -a "$LOG"
