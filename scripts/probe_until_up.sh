#!/usr/bin/env bash
# Poll the axon tunnel until device discovery + one tiny matmul succeed,
# then run the queued round-2f hardware batch. Each probe runs under its
# own timeout so a hung discovery never wedges the loop.
#
#   bash scripts/probe_until_up.sh   (run in background; logs to
#                                     bench_out/probe_until_up.log)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
mkdir -p bench_out
LOG=bench_out/probe_until_up.log

probe() {
  timeout 240 python - <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((8, 8))
y = (x @ x).block_until_ready()
print(f"probe ok: {d} sum={float(y.sum())} in {time.time()-t0:.1f}s")
EOF
}

n=0
while true; do
  n=$((n + 1))
  echo "=== probe $n $(date +%T) ===" >> "$LOG"
  if probe >> "$LOG" 2>&1; then
    echo "=== tunnel UP at $(date +%T); running r2f batch ===" >> "$LOG"
    bash scripts/run_r2f_hw.sh >> "$LOG" 2>&1
    echo "=== r2f batch done $(date +%T) ===" >> "$LOG"
    exit 0
  fi
  echo "--- probe $n failed/timed out $(date +%T); sleeping 180s ---" >> "$LOG"
  sleep 180
done
