#!/usr/bin/env bash
# Remaining round-2 probes (block variants at M=1 + batch-1 MLP), run
# detached; earlier attempts may have warmed the remote compile cache.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=${1:-/tmp/probe_r2b.log}
: > "$LOG"

probe() {
  echo "== probe $*" >> "$LOG"
  timeout 1200 python scripts/probe_decode.py "$@" >> "$LOG" 2>&1 \
    || echo "TIMEOUT/FAIL $*" >> "$LOG"
}

probe 1 4096 4096 10 shift bf16 4096 1024
probe 1 4096 4096 10 shift bf16 2048 1024
probe 1 4096 4096 10 shift bf16 2048 512
probe 1 4096 4096 10 shift bf16 512 2048
echo "== mlp batch-1" >> "$LOG"
timeout 1200 python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 1 >> "$LOG" 2>&1 \
  || echo "TIMEOUT/FAIL mlp" >> "$LOG"
echo "== mlp batch-256" >> "$LOG"
timeout 1200 python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 256 >> "$LOG" 2>&1 \
  || echo "TIMEOUT/FAIL mlp256" >> "$LOG"
echo DONE >> "$LOG"
