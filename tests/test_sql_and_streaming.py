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
