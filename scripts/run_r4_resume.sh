#!/usr/bin/env bash
# Resume the round-4 hardware batch: the steps run_r4_hw.sh had not yet
# completed when it was stopped (same invariants — see run_r4_hw.sh;
# verify_flash and verify_lm already PASSED at this code state, gating
# re-checked here from their artifacts).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out
LOG=bench_out/r4_hw.log

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
  echo "REFUSING to run: working tree is dirty — commit first."
  exit 1
fi
if ! grep -q "PASS" bench_out/verify_flash.txt || ! grep -q "PASS" bench_out/verify_lm.txt; then
  echo "REFUSING: verify gates not green in bench_out — run run_r4_hw.sh instead."
  exit 1
fi

run bench_flash 1500 python scripts/bench_flash.py
run decode_flash 900 python -m smmb_tpu decode --flash
run verify_flash_decode 2400 python scripts/verify_flash_decode.py
run spec_win 4000 python scripts/bench_spec_win.py
run kvq_crossover 3000 python scripts/bench_kvq_crossover.py
run batch_decode 3000 python scripts/probe_batch_decode.py
run headline 900 python bench.py
run headline_run2 900 python bench.py
run headline_run3 900 python bench.py
python scripts/check_docs.py | tee -a "$LOG"
