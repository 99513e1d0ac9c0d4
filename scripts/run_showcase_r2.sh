#!/usr/bin/env bash
# Round-2 showcase artifact: all 5 main.cpp cases x the full kernel
# registry, run case-by-case so tunnel interruptions don't lose progress.
# Merge + plot at the end.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=bench_out
LOG=${1:-/tmp/showcase_r2.log}
mkdir -p "$OUT"
: > "$LOG"

i=0
for case in 1x512x2048 1x1024x4096 16x512x2048 64x1024x4096 256x1024x4096; do
  i=$((i+1))
  echo "== case $case" >> "$LOG"
  timeout 3000 python -m smmb_tpu showcase --cases "$case" \
    --csv "$OUT/showcase_case$i.csv" >> "$LOG" 2>&1 \
    || echo "TIMEOUT/FAIL case $case" >> "$LOG"
done

echo "== merge" >> "$LOG"
python - >> "$LOG" 2>&1 <<'PYEOF'
import csv, glob

rows, header = [], None
for f in sorted(glob.glob("bench_out/showcase_case*.csv")):
    with open(f) as fh:
        r = list(csv.reader(fh))
    if not r:
        continue
    header = r[0]
    rows += r[1:]
with open("bench_out/showcase.csv", "w", newline="") as fh:
    w = csv.writer(fh)
    w.writerow(header)
    w.writerows(rows)
print(f"merged {len(rows)} rows")

from smmb_tpu.bench.report import plot_performance
dicts = [dict(zip(header, row)) for row in rows]
for d in dicts:
    for k in ("time_s", "frac_roofline", "eff_flops_per_s", "nnz_per_s",
              "max_err", "flops"):
        try:
            d[k] = float(d[k])
        except Exception:
            pass
    d["valid"] = d.get("valid") in ("True", True)
print("plot:", plot_performance(dicts, "bench_out/showcase.png"))
PYEOF
echo DONE >> "$LOG"
