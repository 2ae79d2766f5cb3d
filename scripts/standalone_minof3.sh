#!/usr/bin/env bash
# Round-4 scaling-evidence protocol (VERDICT r3 item 1): min-of-3 at
# BOTH cluster sizes, matched 8g executor heaps, interleaved
# (c8,c32) pairs so co-tenant drift hits both legs alike. Writes one
# raw JSON per sample to BENCH/scaling_r4/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p BENCH/scaling_r4
export SPARK_GRAFT_EXEC_MEM=8g        # MATCHED heaps on both legs
export SPARK_GRAFT_IMG_SCALE=3        # r3 study payload regime (BENCH/
# scaling_r3/README.md): ~90KB avg encoded image, ~70G round payload —
# the default img_scale=6 quadruples that to ~280G, beyond this box
export SPARK_GRAFT_SCALING_BUDGET=80  # 80 x 50k hosts = 4M pops/round
LOG=BENCH/scaling_r4/run.log
for s in 1 2 3; do
  for cores in 8 32; do
    out="BENCH/scaling_r4/standalone80_8g_pin_c${cores}_s${s}.json"
    if [ -s "$out" ]; then echo "skip $out (exists)" >>"$LOG"; continue; fi
    echo "=== sample $s cores $cores start $(date -u +%T)" >>"$LOG"
    python scripts/standalone_scaling.py --cores-max "$cores" --out "$out" \
      >>"$LOG" 2>&1
    rc=$?   # capture BEFORE any $(...) which would clobber $?
    if [ "$rc" -ne 0 ] || [ ! -s "$out" ]; then
      echo "=== sample $s cores $cores FAILED rc=$rc at $(date -u +%T)" >>"$LOG"
    else
      echo "=== sample $s cores $cores done  $(date -u +%T) rc=$rc" >>"$LOG"
    fi
    sleep 10
  done
done
# control pair: compute-bound payload (img_scale=1, ~8G round payload)
# isolates ENGINE scaling from the one-box shared-memory-bus ceiling —
# if this pair scales >=0.8, the 4M-payload shortfall is bus-bound, not
# an engine bottleneck.
for cores in 8 32; do
  out="BENCH/scaling_r4/ctrl_scale1_pin_c${cores}.json"
  if [ -s "$out" ]; then continue; fi
  echo "=== ctrl scale1 cores $cores start $(date -u +%T)" >>"$LOG"
  SPARK_GRAFT_IMG_SCALE=1 python scripts/standalone_scaling.py --cores-max "$cores" --out "$out" >>"$LOG" 2>&1
  rc=$?
  echo "=== ctrl scale1 cores $cores done rc=$rc at $(date -u +%T)" >>"$LOG"
  sleep 10
done
echo "ALL_SAMPLES_DONE $(date -u +%T)" >>"$LOG"
