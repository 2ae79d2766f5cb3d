#!/usr/bin/env python
"""Serving-layer point-GET micro-bench (VERDICT r4 item 8).

Measures what the kbucket design claims but never measured: point-GET
latency stays flat as the cache table grows 10x and across a
compaction boundary (the (name, kbucket, key) equality filters prune
parquet files/row-groups via footer min/max, so a bigger table must
not mean a slower lookup).

Protocol: bulk-load the cache at increasing sizes (1k → 10k entries),
at each size take the MEDIAN of 15 point-GETs (cold-cache medians —
co-tenant noise on this box makes min/median the honest statistic),
then force one compact() and measure again on the folded table.

    python scripts/serve_microbench.py --out BENCH/scaling_r5/serve_micro.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [1000, 3000, 10000]
N_GETS = 15


def bulk_load(spark, store, cache, n_from: int, n_to: int, tick: int) -> None:
    """Append rows n_from..n_to in 250-row batches, one data dir each —
    the fragmented many-small-files state a put()-driven cache table
    actually reaches between compactions (a put() per row would run the
    COMPACT_AFTER_DIRS fold thousands of times; batching keeps the
    bench honest about FILE COUNT without that)."""
    from pyspider_spark.serve import SERVING_CACHE, _kbucket

    for s in range(n_from, n_to, 250):
        rows = [
            {
                "name": "bench:ks",
                "kbucket": _kbucket(f"key-{i}"),
                "key": f"key-{i}",
                "value": json.dumps({"i": i, "payload": "x" * 200}),
                "cached_tick": tick,
            }
            for i in range(s, min(s + 250, n_to))
        ]
        store.append_rows(cache.table, rows, SERVING_CACHE)


def measure(cache, n_rows: int, tick: int) -> dict:
    lat = []
    for g in range(N_GETS):
        key = f"key-{(g * 997) % n_rows}"  # spread across kbuckets
        t0 = time.perf_counter()
        v = cache.get("bench:ks", key, tick)
        lat.append(time.perf_counter() - t0)
        assert v is not None, f"lost row {key} at size {n_rows}"
    return {
        "rows": n_rows,
        "median_ms": round(1000 * statistics.median(lat), 1),
        "p90_ms": round(1000 * sorted(lat)[int(0.9 * len(lat))], 1),
        "min_ms": round(1000 * min(lat), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspider_spark.serve import ServingCache
    from pyspider_spark.session import get_spark
    from pyspider_spark.tables import TableStore

    spark = get_spark("serve-micro", cores=args.cores)
    spark.range(1000).count()
    wd = tempfile.mkdtemp(prefix="serve_micro_")
    store = TableStore(spark, wd)
    cache = ServingCache(store, ttl_ticks=10**9)
    tick = 1

    out: dict = {"cores": args.cores, "n_gets": N_GETS, "points": []}
    prev = 0
    for size in SIZES:
        bulk_load(spark, store, cache, prev, size, tick)
        prev = size
        pt = measure(cache, size, tick)
        pt["phase"] = "pre-compact" if size == SIZES[-1] else "grown"
        pt["data_dirs"] = store.n_data_dirs(cache.table)
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)

    # one compaction boundary on the largest table
    t0 = time.perf_counter()
    cache.compact(tick)
    out["compact_seconds"] = round(time.perf_counter() - t0, 2)
    pt = measure(cache, SIZES[-1], tick)
    pt["phase"] = "post-compact"
    pt["data_dirs"] = store.n_data_dirs(cache.table)
    out["points"].append(pt)
    print(json.dumps(pt), flush=True)

    # flatness gate: 10x growth must not blow up the point-GET —
    # generous 3x bound (co-tenant noise), the claim is O(pruned), not O(N)
    first = out["points"][0]["median_ms"]
    last = out["points"][-1]["median_ms"]
    out["flat_10x"] = bool(last <= 3 * first)
    payload = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
