#!/usr/bin/env bash
# Benchmark automation — the TPU analog of the reference's benchmark.sh
# (/root/reference/benchmark.sh). There is no turbo/governor/affinity to pin
# on a TPU VM; the environment controls that matter here are deterministic
# seeds (built into the harness), compile-cache warm-up (the measure protocol
# does this), and writing every artifact (CSV, plot, JSON) from one entry.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-bench_out}
mkdir -p "$OUT"

echo "== headline metric (bench.py)"
python bench.py | tee "$OUT/headline.json"

echo "== showcase (main.cpp analog)"
python -m smmb_tpu showcase --csv "$OUT/showcase.csv" --plot "$OUT/showcase.png" \
  | tee "$OUT/showcase.txt"

echo "== scaling (1..N devices)"
python -m smmb_tpu scaling | tee "$OUT/scaling.txt"

echo "artifacts in $OUT/"
