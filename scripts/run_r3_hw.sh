#!/usr/bin/env bash
# Round-3 hardware batch. Validation gates timing (the reference
# invariant, main.cpp:317-320): a verify FAIL skips dependent timing
# steps and writes an INVALID marker instead of numbers.
#
#   bash scripts/run_r3_hw.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out

run() { # name timeout cmd...
  local name=$1 to=$2 rc; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a bench_out/r3_hw.log
  timeout "$to" "$@" > bench_out/"$name".txt 2>&1
  rc=$?
  grep -v WARNING bench_out/"$name".txt | tail -20
  echo "--- $name exit=$rc (124=timeout) ---" | tee -a bench_out/r3_hw.log
  return $rc
}

# 1) flash parity gate -> flash timing
if run verify_flash 900 python scripts/verify_flash.py; then
  run bench_flash 1500 python scripts/bench_flash.py
else
  echo "SKIP bench_flash: verify_flash FAILED" | tee -a bench_out/r3_hw.log
  echo "INVALID: verify_flash failed parity; no timing published" \
    > bench_out/bench_flash.txt
fi

# 2) LM decode parity gate -> serving benches
if run verify_lm 1200 python scripts/verify_lm.py; then
  run lm_bench 900 python -m smmb_tpu lm --steps 64
  run decode_bench 900 python -m smmb_tpu decode
  run decode_flash 900 python -m smmb_tpu decode --flash
  run verify_flash_decode 2400 python scripts/verify_flash_decode.py
  run spec_win 3000 python scripts/bench_spec_win.py
  run kvq_crossover 3000 python scripts/bench_kvq_crossover.py
else
  echo "SKIP serving benches: verify_lm FAILED" | tee -a bench_out/r3_hw.log
  for f in lm_bench decode_bench spec_win kvq_crossover; do
    echo "INVALID: verify_lm failed parity; no timing published" \
      > bench_out/"$f".txt
  done
fi

# 3) headline (bench.py validates internally via the parity-tested kernel
#    path; 3 runs document reproducibility)
run headline 900 python bench.py
run headline_run2 900 python bench.py
run headline_run3 900 python bench.py

# 4) per-kernel trace profile (kperf analog) -> docs/PROFILE.md
run profile_kernels 1800 python scripts/profile_kernels.py
