#!/usr/bin/env bash
# Round-2 tuning probes: W2A8 at the headline shape, M=1 weight-streaming
# block sizes, and the batch-1 MLP. Each probe runs under timeout so a
# pathological Mosaic compile cannot wedge the session.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=${1:-/tmp/probe_r2.log}
: > "$LOG"

probe() {  # M K N nz decode dtype [bn bk]
  echo "== probe $*" >> "$LOG"
  timeout 560 python scripts/probe_decode.py "$@" >> "$LOG" 2>&1 \
    || echo "TIMEOUT/FAIL $*" >> "$LOG"
}

# --- W2A8 at the headline config (256x4096x4096 @10%) ---
probe 256 4096 4096 10 shift int8
probe 256 4096 4096 10 fold  int8
probe 256 4096 4096 10 shift int8 512 1024
probe 256 4096 4096 10 fold  int8 512 2048
probe 256 4096 4096 10 shift bf16        # bf16 baseline same data
# --- M=1 big-layer block sizes (MLP regime: 4096x4096) ---
probe 1 4096 4096 10 shift bf16
probe 1 4096 4096 10 shift bf16 2048 1024
probe 1 4096 4096 10 shift bf16 512 2048
probe 1 4096 4096 10 shift bf16 2048 512
probe 1 4096 4096 10 shift bf16 4096 1024
# --- batch-1 MLP end-to-end ---
echo "== mlp batch-1" >> "$LOG"
timeout 560 python -m smmb_tpu mlp --depth 4 --dim 4096 --batch 1 >> "$LOG" 2>&1 \
  || echo "TIMEOUT/FAIL mlp" >> "$LOG"
echo DONE >> "$LOG"
