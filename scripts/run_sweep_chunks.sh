#!/usr/bin/env bash
# Chunked, resumable run of the full SparseGEMM.cpp 81-config sweep grid
# (bench/sweep.py SWEEP_* == /root/reference/SparseGEMM.cpp:74-80) on the
# TPU chip. One chunk per (non_zero, m) pair => 9 chunks x 9 shapes; a chunk
# whose part-CSV already exists is skipped, so the script can be re-run
# after a crash or tunnel stall without losing completed work.
#
#   scripts/run_sweep_chunks.sh          # run all missing chunks, then merge
#   scripts/run_sweep_chunks.sh merge    # merge existing parts only
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=bench_out
mkdir -p "$OUT"

# reference sweep times 4 kernels (GEMM/sGEMM +- PReLU, SparseGEMM.cpp:149-156);
# ours adds the serving modes + the 8x8-block BCSR compatibility row
# round 5 adds the format-native TCSC rows (padded-sentinel routing on
# TPU — the former 100-iteration chip-fault cap is gone, VERDICT r4 #6)
KERNELS='["dense","dense_prelu","packed_kernel","packed_kernel_prelu","packed_kernel_bf16","packed_kernel_w2a8","bcsr","tcsc_segsum","tcsc_segsum_prelu"]'

if [[ "${1:-}" != "merge" ]]; then
  for nz in 2 8 16; do
    for m in 1 16 64; do
      part="$OUT/sweep_part_nz${nz}_m${m}.csv"
      if [[ -s "$part" ]]; then
        echo "== skip nz=$nz m=$m (exists)"
        continue
      fi
      cfg="$OUT/sweep_cfg_nz${nz}_m${m}.json"
      cat > "$cfg" <<EOF
{"ms": [$m], "ks": [256, 512, 1024], "ns": [512, 1024, 2048],
 "non_zeros": [$nz], "kernels": $KERNELS,
 "iters": null, "reps": 5, "alpha": 0.25, "seed": 0,
 "mesh_shapes": [[1, 1]], "validate": true}
EOF
      echo "== sweep chunk nz=$nz m=$m ($(date -u +%H:%M:%S))"
      timeout 5400 python -m smmb_tpu sweep --config "$cfg" \
        --csv "$part" 2>>"$OUT/sweep.log" >/dev/null \
        || { echo "!! chunk nz=$nz m=$m failed/timed out"; rm -f "$part"; }
    done
  done
fi

# merge whatever parts exist into the canonical artifact + plot
python - <<'PY'
import csv, glob, sys
sys.path.insert(0, ".")
rows = []
header = None
for f in sorted(glob.glob("bench_out/sweep_part_nz*_m*.csv")):
    with open(f) as fh:
        r = list(csv.reader(fh))
    if not r:
        continue
    header = r[0]
    rows += r[1:]
if header is None:
    raise SystemExit("no parts found")
with open("bench_out/sweep.csv", "w", newline="") as fh:
    w = csv.writer(fh)
    w.writerow(header)
    w.writerows(rows)
print(f"merged {len(rows)} rows -> bench_out/sweep.csv")
from smmb_tpu.bench.report import plot_performance
recs = [dict(zip(header, row)) for row in rows]
for r in recs:
    for k in ("time_s", "eff_flops_per_s", "nnz_per_s", "frac_roofline",
              "max_err"):
        try:
            r[k] = float(r[k])
        except ValueError:
            r[k] = float("nan")
    r["valid"] = r["valid"] == "True"
    r["dispatch_bound"] = r.get("dispatch_bound") == "True"
plot_performance(recs, "bench_out/sweep.png")
print("wrote bench_out/sweep.png")
PY
echo "sweep artifact complete"
