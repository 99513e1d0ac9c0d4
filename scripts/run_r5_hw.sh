#!/usr/bin/env bash
# Round-5 hardware batch. Same two invariants as run_r4_hw.sh (validate
# gates timing; every artifact stamped with the clean HEAD it measured —
# mismatching/dirty stamps are discarded). Round-5 additions: the merged
# int8 cache + epilogue-quant serving benches, the batched spec-decode
# section, the capacity-scale sweep (the reference's ORIGINAL grid), the
# quant-batch probe, and the legacy-alpha dispatch-annotated sweep grid.
#
#   bash scripts/run_r5_hw.sh
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
  grep -v WARNING bench_out/"$name".txt | tail -20
  echo "--- $name exit=$rc (124=timeout) ---" | tee -a "$LOG"
  return $rc
}

if [ -n "$(git status --porcelain --untracked-files=no -- smmb_tpu scripts bench.py __graft_entry__.py tests)" ]; then
  echo "REFUSING to run: working tree is dirty — commit first so artifacts"
  echo "describe a commit (round-3 lesson: evidence must match HEAD)."
  exit 1
fi

# 1) flash parity gate -> flash timing
if run verify_flash 1200 python scripts/verify_flash.py; then
  run bench_flash 1500 python scripts/bench_flash.py
else
  echo "SKIP bench_flash: verify_flash FAILED" | tee -a "$LOG"
  echo "INVALID: verify_flash failed parity; no timing published" \
    > bench_out/bench_flash.txt
fi

# 2) LM decode parity gate -> serving benches
if run verify_lm 1200 python scripts/verify_lm.py; then
  run lm_bench 900 python -m smmb_tpu lm --steps 64
  run decode_bench 900 python -m smmb_tpu decode
  run decode_flash 900 python -m smmb_tpu decode --flash
  run verify_flash_decode 2400 python scripts/verify_flash_decode.py
  run spec_win 5400 python scripts/bench_spec_win.py
  run kvq_crossover 3000 python scripts/bench_kvq_crossover.py
  run batch_decode 3000 python scripts/probe_batch_decode.py
  run quant_batch 1500 python scripts/probe_quant_batch.py
  run profile 2400 python scripts/profile_kernels.py
else
  echo "SKIP serving benches: verify_lm FAILED" | tee -a "$LOG"
  for f in lm_bench decode_bench decode_flash verify_flash_decode \
           spec_win kvq_crossover batch_decode quant_batch; do
    echo "INVALID: verify_lm failed parity; no timing published" \
      > bench_out/"$f".txt
  done
fi

# 3) MLP serving + single-chip scaling anchor (stamped via the CLI)
run mlp_bench 1200 bash -c \
  "python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 256 && \
   python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 1"
run scaling_tpu_1x1 1500 python -m smmb_tpu scaling

# 4) capacity-scale sweep: the reference's ORIGINAL grid up to
#    64000x16384x4096, streamed M-tiles (VERDICT r4 missing #1)
run sweep_large 5400 python -m smmb_tpu capacity --reps 3 \
  --csv bench_out/sweep_large.csv --plot bench_out/sweep_large.png

# 5) the 81-config legacy sweep grid (alpha=0.25, dispatch-floor column,
#    TCSC padded-sentinel rows, uncapped) — chunked/resumable
rm -f bench_out/sweep_part_nz*_m*.csv
bash scripts/run_sweep_chunks.sh 2>&1 | tee -a "$LOG" | tail -5

# 6) showcase (main.cpp analog)
run showcase 5400 python -m smmb_tpu showcase \
  --csv bench_out/showcase.csv --plot bench_out/showcase.png

# 7) headline (3 runs document reproducibility)
run headline 900 python bench.py
run headline_run2 900 python bench.py
run headline_run3 900 python bench.py

# 8) docs-artifact consistency (mechanized)
python scripts/check_docs.py | tee -a "$LOG"
