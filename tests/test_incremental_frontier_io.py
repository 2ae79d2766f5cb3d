"""Incremental-frontier write-I/O guarantee (round-2 scale fix).

The round-1 engine rewrote the ENTIRE frontier table every round
(overwrite of backlog + delta), so per-round write I/O was O(backlog)
— a scale-killer at 10^10 frontier rows. The incremental design
(loop.py: pop tombstones + delta appends) must write O(popped + new)
rows per round, independent of how large the deferred backlog is.

This test pins that contract mechanically: the same "hot" row set is
popped out of two frontiers whose cold backlogs differ 10x, and the
bytes/rows landed by the round must be (near-)identical — the 10x
extra backlog costs zero write I/O. It also asserts the frontier
snapshot op stays ``append`` (no overwrite path hiding a rewrite).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspider_spark.loop import CrawlEngine
from pyspider_spark.synth import GraphSpec

N_HOSTS = 50
HOT_ROWS = 20_000  # identical in both runs; all pops come from here


def _frontier(spark, n_rows: int, n_hosts: int):
    """Lazily generated frontier (the 10^10-row pattern — never
    materialized driver-side). Rows with id < HOT_ROWS carry hashed
    priorities in [500, 1500); filler rows carry priority 0, so the
    per-host top-`budget` pop set is exactly the same regardless of
    how much filler backlog sits behind it."""
    kind = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5))
    host = F.format_string("host%d.example", F.pmod(F.xxhash64("id"), F.lit(n_hosts)))
    url = F.when(
        kind == 0, F.format_string("https://%s/img/i%d", host, F.col("id"))
    ).otherwise(F.format_string("https://%s/detail/d%d", host, F.col("id")))
    hot = F.col("id") < F.lit(HOT_ROWS)
    prio = F.when(
        hot, F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) + F.lit(500)
    ).otherwise(F.lit(0))
    return spark.range(n_rows).select(
        url.alias("url"),
        url.alias("url_canon"),
        host.alias("host"),
        prio.cast("int").alias("priority"),
        F.lit(0).cast("long").alias("exetime"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(3).cast("int").alias("max_retries"),
        F.when(kind == 0, F.lit("img")).otherwise(F.lit("detail")).alias("stage"),
        F.lit(None).cast("map<string,string>").alias("meta"),
        F.lit(0).cast("int").alias("round_added"),
        F.lit("synthetic").alias("lineage"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(16)).cast("int").alias("salt"),
        F.lit(True).alias("vetted"),
    )


def _dir_bytes(dirs) -> int:
    total = 0
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(d, f))
    return total


def _run_one_round(spark, wd: str, n_rows: int) -> dict:
    spec = GraphSpec(n_hosts=N_HOSTS, seed_tag="io", img_scale=1)
    eng = CrawlEngine(spark, wd, spec, n_seen_partitions=8)
    eng.store.overwrite("frontier", _frontier(spark, n_rows, N_HOSTS))
    eng.last_frontier_rows = n_rows
    stats = eng.run_round(0)

    store = eng.store
    fm = store._load_manifest("frontier")
    cur = store._snapshot(fm, None)
    return {
        "popped": stats.popped,
        "tomb_rows": store.last_append_rows("tomb"),
        "delta_rows": store.last_append_rows("frontier"),
        "delta_bytes": _dir_bytes([cur["dirs"][-1]]),
        "table_bytes": _dir_bytes(cur["dirs"]),
        "ops": [s["op"] for s in fm["snapshots"]],
    }


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    small = _run_one_round(
        spark, str(tmp_path_factory.mktemp("io_small")), HOT_ROWS
    )
    big = _run_one_round(
        spark, str(tmp_path_factory.mktemp("io_big")), HOT_ROWS * 10
    )
    return small, big


def test_pop_set_is_backlog_independent(runs):
    small, big = runs
    assert small["popped"] == big["popped"] > 0


def test_tombstones_match_pops_exactly(runs):
    for r in runs:
        assert r["tomb_rows"] == r["popped"]


def test_round_write_rows_track_popped_plus_new_not_backlog(runs):
    small, big = runs
    # identical pops => identical discovered links => identical delta
    assert small["delta_rows"] == big["delta_rows"]
    # and the delta is O(popped + new), nowhere near the backlog
    assert big["delta_rows"] < HOT_ROWS


def test_round_write_bytes_independent_of_backlog(runs):
    small, big = runs
    # 10x more backlog must not change this round's write I/O
    # (same rows land; allow parquet layout jitter)
    assert big["delta_bytes"] < small["delta_bytes"] * 1.5 + 4096
    # and the round's write is a small fraction of the big table
    assert big["delta_bytes"] < big["table_bytes"] * 0.5


def test_frontier_is_never_rewritten(runs):
    _, big = runs
    # one overwrite = the test's own injection; everything after appends
    assert big["ops"][0] == "overwrite"
    assert all(op == "append" for op in big["ops"][1:])
