#!/usr/bin/env python
"""Hardware scaling ceiling for the image payload — NO Spark involved.

Runs the full per-image payload pipeline (synthesis + png/lossy encode
+ phash, i.e. ``synth.image_row``) in a plain multiprocessing pool at
two pinned core counts. This bounds what ANY engine can measure for
N-to-4N scaling efficiency on this box: the payload is pure
independent CPU work with zero coordination, so its pool-level
efficiency is the shared-memory-bus ceiling. Spark overhead can only
subtract from it.

Measured on the round-2 sandbox (32 cores, one shared memory bus):
8 procs 911 img/s -> 32 procs 2960 img/s = 3.25x = 0.81 efficiency.
The BASELINE.json 0.8 target therefore sits AT the hardware ceiling of
this single box; a real 4N-executor cluster brings 4x memory buses.

Usage:
    python scripts/payload_ceiling.py            # 8 and 32, prints JSON
    python scripts/payload_ceiling.py --procs 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PER_PROC = int(os.environ.get("SPARK_GRAFT_CEILING_IMAGES", "200"))
IMG_SCALE = int(os.environ.get("SPARK_GRAFT_IMG_SCALE", "3"))


def _worker(args: tuple[int, int]) -> float:
    per, seed = args
    sys.path.insert(0, REPO)
    from pyspider_spark.synth import GraphSpec, image_row

    spec = GraphSpec(n_hosts=100, seed_tag="ceiling", img_scale=IMG_SCALE)
    t0 = time.perf_counter()
    for i in range(per):
        image_row(spec, f"host{i % 100}.example", f"c{seed}_{i}")
    return per / (time.perf_counter() - t0)


def run(nproc: int) -> dict:
    # pin pool + children to the first nproc cores (children inherit),
    # same honesty rule as scaling_bench.run_one
    try:
        os.sched_setaffinity(0, set(range(nproc)))
    except (AttributeError, OSError):
        pass
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    with ProcessPoolExecutor(nproc) as ex:
        rates = list(ex.map(_worker, [(PER_PROC, p) for p in range(nproc)]))
    return {
        "procs": nproc,
        "images_per_proc": PER_PROC,
        "img_scale": IMG_SCALE,
        "total_img_per_sec": round(sum(rates), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=None)
    args = ap.parse_args()
    if args.procs is not None:
        print(json.dumps(run(args.procs)))
        return
    # run each level in a fresh subprocess so affinity doesn't leak
    import subprocess

    out = {}
    for n in (8, 32):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--procs", str(n)],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        out[n] = json.loads(r.stdout.strip().splitlines()[-1])
    speed = out[32]["total_img_per_sec"] / out[8]["total_img_per_sec"]
    print(
        json.dumps(
            {
                "N": out[8],
                "4N": out[32],
                "speedup_N_to_4N": round(speed, 3),
                "ceiling_efficiency": round(speed / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
