#!/usr/bin/env bash
# Round-4 hardware batch. Two invariants, both from the reference's
# validate-then-measure-in-one-run contract (main.cpp:317-320):
#   1. validation gates timing — a verify FAIL skips dependent steps and
#      writes an INVALID marker instead of numbers;
#   2. every artifact must be stamped with the git HEAD it measured
#      (scripts print '[stamp] git=...' first) — the runner REFUSES to
#      keep an artifact whose stamp differs from HEAD or is dirty.
#
#   bash scripts/run_r4_hw.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out
LOG=bench_out/r4_hw.log

run() { # name timeout cmd...
  local name=$1 to=$2 rc; shift 2
  # HEAD re-read per step: docs-only commits landing mid-batch must not
  # invalidate later artifacts (the stamp itself is scoped to code paths,
  # and the dirty-tree refusal below still guards code edits) — a fixed
  # start-of-batch HEAD discarded two artifacts this round when README
  # commits moved HEAD under a running batch
  local HEAD
  HEAD=$(git rev-parse --short=12 HEAD)
  echo "=== $name ($(date +%T)) ===" | tee -a "$LOG"
  timeout "$to" "$@" > bench_out/"$name".txt 2>&1
  rc=$?
  # stamp enforcement: artifact must carry git=<HEAD> (clean)
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
if run verify_flash 900 python scripts/verify_flash.py; then
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
  run spec_win 4000 python scripts/bench_spec_win.py
  run kvq_crossover 3000 python scripts/bench_kvq_crossover.py
  run batch_decode 3000 python scripts/probe_batch_decode.py
  run profile 2400 python scripts/profile_kernels.py
else
  echo "SKIP serving benches: verify_lm FAILED" | tee -a "$LOG"
  for f in lm_bench decode_bench decode_flash verify_flash_decode \
           spec_win kvq_crossover; do
    echo "INVALID: verify_lm failed parity; no timing published" \
      > bench_out/"$f".txt
  done
fi

# 3) headline (bench.py validates internally via the parity-tested kernel
#    path; 3 runs document reproducibility)
run headline 900 python bench.py
run headline_run2 900 python bench.py
run headline_run3 900 python bench.py

# 4) docs-artifact consistency (mechanized; VERDICT r3 #5)
python scripts/check_docs.py | tee -a "$LOG"
