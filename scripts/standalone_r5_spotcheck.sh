#!/usr/bin/env bash
# Round-5 scaling spot-check: the r4 min-of-3 matched-heap pinned
# protocol (BENCH/BASELINE.md headline, 0.818) re-sampled with the
# round-5 code — interleaved (c8, c32) pairs, same 4M-pop round,
# matched 8g heaps, pinned workers. Skip-if-exists per sample so the
# script is resumable.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p BENCH/scaling_r5
export SPARK_GRAFT_EXEC_MEM=8g
export SPARK_GRAFT_IMG_SCALE=3
export SPARK_GRAFT_SCALING_BUDGET=80
LOG=BENCH/scaling_r5/standalone_run.log
N_SAMPLES="${1:-2}"
for s in $(seq 1 "$N_SAMPLES"); do
  for cores in 8 32; do
    out="BENCH/scaling_r5/standalone80_8g_pin_c${cores}_s${s}.json"
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
echo DONE >>"$LOG"
