"""SQL temp-view surface + Structured Streaming tail over engine tables."""

from __future__ import annotations

import pytest

from pyspider_spark import sqlviews, streaming
from pyspider_spark.loop import CrawlEngine
from pyspider_spark.synth import GraphSpec

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="sqlstream1")


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("sqlstream"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    stats = eng.run(max_rounds=3)
    return eng, wd, stats


def test_sql_views(crawl, spark):
    eng, _, stats = crawl
    views = sqlviews.register_views(eng.store)
    assert {"frontier", "seen", "items", "metrics", "config", "robots"} <= set(views)
    per_part = spark.sql(
        "SELECT partition_id, count(*) AS n FROM seen GROUP BY partition_id ORDER BY partition_id"
    ).collect()
    assert sum(r.n for r in per_part) == spark.sql("SELECT count(*) c FROM seen").collect()[0].c
    report = sqlviews.crawl_report_sql(spark).collect()
    # one metrics-table row per crawl round (the round=-1 bootstrap
    # checkpoint lives in the ledger, not the metrics table)
    assert [r.round for r in report] == [s.round for s in stats]


def test_seed_stream_drains_into_frontier(spark, tmp_path_factory):
    """S10 Kafka-source path, broker-less: seed frames staged with the
    Kafka (key, value-JSON) framing drain through the file-source
    stand-in into the frontier — vetted like discovered links (dup vs
    the enqueued set dropped, robots-blocked dropped) — and get popped
    by the next round."""
    from pyspark.sql import functions as F

    from pyspider_spark.schemas import FRONTIER
    from pyspider_spark.sinks import JsonFileSink
    from pyspider_spark.synth import seed_urls

    wd = str(tmp_path_factory.mktemp("ingest_wd"))
    stage = str(tmp_path_factory.mktemp("seed_topic"))
    spec = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="ingest1")
    eng = CrawlEngine(spark, wd, spec, n_seen_partitions=4,
                      collect_pop_sequence=True)
    eng.bootstrap()
    fr0 = eng.store.count_rows("frontier")

    novel = [
        "https://host0.example/list/7/page/9",
        "https://host1.example/detail/sku-ingested",
    ]
    dup = seed_urls(spec)[0]  # canonicalizes to an already-enqueued seed
    blocked = "https://host0.example/private/x"
    frames = spark.createDataFrame(
        [(u,) for u in novel + [dup, blocked]], ["url"]
    )
    JsonFileSink(stage).write("seeds", frames)

    src = streaming.file_seed_source(spark, f"{stage}/seeds")
    assert src.isStreaming
    n = streaming.drain_seeds_into_engine(src, eng, next_round=0)
    assert n == 2, "dup and robots-blocked seeds must be vetted out"
    assert eng.store.count_rows("frontier") == fr0 + 2

    added = eng.store.read_or_empty("frontier", FRONTIER).filter(
        F.col("round_added") == -1
    )
    got = {r.url_canon for r in added.collect()}
    assert got == set(novel)
    assert all(r.exetime == 0 and r.vetted for r in added.collect())

    # the ingested rows participate in the next round's pop (seeds
    # surface at their own hash-derived rounds, so assert membership)
    eng.run_round(0)
    assert set(novel) <= set(eng.pop_sequences[0])
    # re-draining the same staged frames is a no-op (enqueued set)
    src2 = streaming.file_seed_source(spark, f"{stage}/seeds")
    assert streaming.drain_seeds_into_engine(src2, eng, next_round=1) == 0


def test_streaming_tail_matches_batch(crawl, spark):
    eng, wd, _ = crawl
    stream = streaming.items_per_round(spark, wd)
    assert stream.isStreaming
    streaming.run_once_to_memory(stream, "items_per_round_t")
    got = {
        r.round: r.n_items
        for r in spark.sql("SELECT * FROM items_per_round_t").collect()
    }
    from pyspider_spark.schemas import ITEMS

    want = {
        r.round: r.n
        for r in eng.store.read_or_empty("items", ITEMS)
        .groupBy("round")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_raw_tail_drains_append_mode(crawl, spark):
    """run_once_to_memory on a RAW table tail (no aggregation) must
    pick append mode (Spark rejects complete without an aggregate) and
    deliver every on-disk row exactly once."""
    eng, wd, _ = crawl
    from pyspider_spark.schemas import ITEMS

    raw = streaming.tail_table(spark, wd, "items")
    assert raw.isStreaming
    streaming.run_once_to_memory(raw, "items_raw_t")
    got = spark.sql("SELECT count(*) AS n FROM items_raw_t").collect()[0].n
    want = eng.store.read_or_empty("items", ITEMS).count()
    assert got == want > 0
