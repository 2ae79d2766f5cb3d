#!/bin/bash
# Round-5 dataops study: full op set (minhash, clusters, lsh+recall,
# ivf+recall with the tiled probe) at 8 then 32 cores, sequentially.
set -u
cd /root/repo
for c in 32 8; do
  python scripts/dataops_scaling.py --cores $c \
    --out BENCH/scaling_r5/dataops_c${c}.json \
    > BENCH/scaling_r5/dataops_c${c}.log 2>&1
  rc=$?
  echo "cores=$c rc=$rc $(date -u +%H:%M:%S)" >> BENCH/scaling_r5/run.log
done
echo DONE >> BENCH/scaling_r5/run.log
