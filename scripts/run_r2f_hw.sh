#!/usr/bin/env bash
# Round-2f hardware pass: everything that accumulated while the axon
# tunnel was down. Each step is independently timed out so one hang
# doesn't kill the batch; logs land in bench_out/.
#
#   bash scripts/run_r2f_hw.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out

run() { # name timeout cmd...
  local name=$1 to=$2 rc; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a bench_out/r2f_hw.log
  # capture the COMMAND's status, not the filter pipeline's (tee|tail
  # always exit 0 — a crash or timeout must not be logged as success)
  timeout "$to" "$@" > bench_out/"$name".txt 2>&1
  rc=$?
  grep -v WARNING bench_out/"$name".txt | tail -20
  echo "--- $name exit=$rc (124=timeout) ---" | tee -a bench_out/r2f_hw.log
  return $rc
}

# Reference invariant (main.cpp:317-320, SparseGEMM.cpp:116-118): never
# time a kernel that failed validation. verify_flash exits non-zero on a
# parity FAIL; its timing consumer (bench_flash) is then skipped and the
# stale artifact replaced by an INVALID marker.
# 1) flash kernel: on-chip parity vs f64 oracle + timing point
if run verify_flash 900 python scripts/verify_flash.py; then
  # 2) flash vs einsum at long context (T=4096 MHA, T=8192 GQA)
  run bench_flash 1200 python scripts/bench_flash.py
else
  echo "SKIP bench_flash: verify_flash FAILED" | tee -a bench_out/r2f_hw.log
  echo "INVALID: verify_flash failed parity; no timing published" \
    > bench_out/bench_flash.txt
fi
# 3) speculative decoding: plain vs spec-self vs spec-draft
run spec_bench 1200 python -m smmb_tpu spec --steps 64 --k 4
# 4) LM generate sanity (should still be ~85 us/tok batch-1)
run lm_bench 900 python -m smmb_tpu lm --steps 64
# 5) headline roofline sanity (bench.py prints the driver JSON line)
run headline 900 python bench.py
# 6) serving-feature decode deltas: int8 cache vs bf16 at long context
run lm_kvq 900 python -m smmb_tpu lm --steps 64 --prompt-len 512 --kv-quant
run lm_base_longctx 900 python -m smmb_tpu lm --steps 64 --prompt-len 512
