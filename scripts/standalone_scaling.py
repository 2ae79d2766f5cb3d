#!/usr/bin/env python
"""Scaling evidence on a REAL multi-executor Spark deployment.

A localhost standalone cluster (1 master + 4 worker daemons, 8 cores +
12g each — separate JVMs, real executor processes, the package shipped
via py-files exactly as spark-submit would) runs the SAME giant-frontier
round at two cluster sizes:

    N  = 1 executor  (spark.cores.max=8)
    4N = 4 executors (spark.cores.max=32)

This is the faithful sandbox analogue of the BASELINE.json criterion:
each added executor brings its own JVM heap, GC, shuffle service and
Python workers — unlike local[N], where 4x threads share one heap and
the lost memory-scaling masks the engine's true behavior.

Start/stop the cluster with scripts/standalone_cluster.sh, then:

    python scripts/standalone_scaling.py --cores-max 8
    python scripts/standalone_scaling.py --cores-max 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER = os.environ.get("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")
IMG_SCALE = int(os.environ.get("SPARK_GRAFT_IMG_SCALE", "6"))


def build_zip() -> str:
    """Package pyspider_spark for py-files shipping (the spark-submit
    --py-files contract)."""
    out = os.path.join(tempfile.gettempdir(), "pyspider_spark_pkg")
    zp = shutil.make_archive(out, "zip", REPO, "pyspider_spark")
    return zp


def get_cluster_spark(cores_max: int, app: str):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(MASTER)
        .appName(app)
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.cores", os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "10g"))
        .config("spark.sql.shuffle.partitions", str(cores_max * 2))
        .config("spark.default.parallelism", str(cores_max))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", "8g")
        .config("spark.local.dir", "/tmp/spark-local-driver")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.io.compression.codec", "zstd")
        .config("spark.executorEnv.PYSPARK_PYTHON", sys.executable)
        .config("spark.submit.pyFiles", build_zip())
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def run_one(cores_max: int) -> dict:
    from pyspider_spark.loop import CrawlEngine
    from pyspider_spark.synth import GraphSpec
    from scripts.scaling_bench import (
        FRONTIER_ROWS,
        HOST_BUDGET,
        N_HOSTS,
        build_config,
        build_frontier,
    )

    spark = get_cluster_spark(cores_max, f"scaling-exec-{cores_max}")
    spark.range(1000).count()
    wd = tempfile.mkdtemp(prefix=f"sx{cores_max}_", dir="/dev/shm")
    try:
        spec = GraphSpec(n_hosts=N_HOSTS, seed_tag="scaling2", img_scale=IMG_SCALE,
                         crawl_delay_host0=None)  # keep the r2/r3 scaling protocol byte-identical (4M pops)
        eng = CrawlEngine(spark, wd, spec, n_seen_partitions=64)
        eng.store.overwrite("frontier", build_frontier(spark, FRONTIER_ROWS, N_HOSTS))
        if HOST_BUDGET != 20:  # same amortization knob as scaling_bench
            eng.store.overwrite("config", build_config(spark, N_HOSTS, HOST_BUDGET))
        eng.last_frontier_rows = FRONTIER_ROWS
        t0 = time.perf_counter()
        stats = eng.run_round(0)
        dt = time.perf_counter() - t0
        return {
            "executors": cores_max // int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8")),
            "cores_max": cores_max,
            "frontier_rows": FRONTIER_ROWS,
            "urls_scheduled_fetched": stats.popped,
            "images_landed": stats.images_landed,
            "seconds": round(dt, 2),
            "urls_per_sec": round(stats.popped / dt, 2),
            "frontier_rows_per_sec": round(FRONTIER_ROWS / dt, 2),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-max", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--repeat", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALING_REPEAT", "2")))
    args = ap.parse_args()

    if args.cores_max is not None:
        payload = json.dumps(run_one(args.cores_max))
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload)
        print(payload)
        return

    results = {}
    for cores in (8, 32):
        best, samples = None, []
        for _ in range(args.repeat):
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
                out = f.name
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores-max", str(cores), "--out", out],
                check=True, cwd=REPO,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            with open(out) as fh:
                r = json.load(fh)
            os.unlink(out)
            samples.append(r["seconds"])
            if best is None or r["seconds"] < best["seconds"]:
                best = r
        best["all_seconds"] = samples
        best["urls_per_sec"] = round(best["urls_scheduled_fetched"] / best["seconds"], 2)
        results[cores] = best

    t_n, t_4n = results[8]["seconds"], results[32]["seconds"]
    print(
        json.dumps(
            {
                "mode": "standalone-cluster 1-vs-4 executors",
                "N": results[8],
                "4N": results[32],
                "speedup_N_to_4N": round(t_n / t_4n, 3),
                "scaling_efficiency": round((t_n / t_4n) / 4, 3),
                "target": 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
