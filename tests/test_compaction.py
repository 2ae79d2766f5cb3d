"""Bloom-blob compaction must be content-equivalent: the engine's
outputs with periodic compaction equal an uncompacted run."""

from __future__ import annotations

import hashlib

from pyspider_spark import loop as loop_mod
from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import IMAGES, ITEMS, SEEN, SEEN_FILTERS
from pyspider_spark.synth import GraphSpec

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="compact1")


def digest(eng, name, schema):
    df = eng.store.read_or_empty(name, schema)
    rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def test_compaction_equivalence(spark, tmp_path_factory, monkeypatch):
    wd_a = str(tmp_path_factory.mktemp("compact"))
    monkeypatch.setattr(loop_mod, "COMPACT_EVERY", 2)  # compact aggressively
    a = CrawlEngine(spark, wd_a, SPEC, n_seen_partitions=4)
    a.run(max_rounds=6)
    monkeypatch.setattr(loop_mod, "COMPACT_EVERY", 10_000)  # never
    wd_b = str(tmp_path_factory.mktemp("nocompact"))
    b = CrawlEngine(spark, wd_b, SPEC, n_seen_partitions=4)
    b.run(max_rounds=6)

    for t, s in [("seen", SEEN), ("items", ITEMS), ("images", IMAGES)]:
        assert digest(a, t, s) == digest(b, t, s), t
    # compacted filters: exactly one blob per populated partition
    fa = a.store.read_or_empty("seen_filters", SEEN_FILTERS)
    per_part = fa.groupBy("partition_id").count().collect()
    # last compaction at round 5; rounds after it append one blob each
    assert max(r["count"] for r in per_part) <= 1 + 1  # merged + ≤1 round since


def test_fetch_cache_compaction_bounded_and_equivalent(
    spark, tmp_path_factory, monkeypatch
):
    """fetch_cache compaction (VERDICT r2 #4): the memo table folds to
    its live TTL window at every compaction round — outputs identical
    to an uncompacted run, data-dir count bounded (never O(rounds)),
    expired rows physically dropped, one row per key."""
    from pyspark.sql import functions as F

    from pyspider_spark.schemas import FETCH_CACHE, METRICS

    ttl = 2
    monkeypatch.setattr(loop_mod, "COMPACT_EVERY", 2)
    wd_a = str(tmp_path_factory.mktemp("fc_compact"))
    a = CrawlEngine(spark, wd_a, SPEC, n_seen_partitions=4,
                    fetch_cache_ttl_rounds=ttl)
    a.run(max_rounds=6)
    monkeypatch.setattr(loop_mod, "COMPACT_EVERY", 10_000)
    wd_b = str(tmp_path_factory.mktemp("fc_nocompact"))
    b = CrawlEngine(spark, wd_b, SPEC, n_seen_partitions=4,
                    fetch_cache_ttl_rounds=ttl)
    b.run(max_rounds=6)

    for t, s in [("items", ITEMS), ("images", IMAGES), ("metrics", METRICS)]:
        assert digest(a, t, s) == digest(b, t, s), t
    # bounded: one overwrite dir from the round-5 compaction (the run's
    # last round), vs one append dir per fetching round uncompacted
    assert a.store.n_data_dirs("fetch_cache") == 1
    assert b.store.n_data_dirs("fetch_cache") > 1
    fc = a.store.read_or_empty("fetch_cache", FETCH_CACHE)
    rows = fc.collect()
    assert rows, "memo table must survive compaction"
    # expired rows physically dropped: live window at round 6 is >= 4
    assert all(r.cached_round >= (5 + 1) - ttl for r in rows)
    # last-write-wins fold: one row per key
    assert fc.groupBy("url_canon").count().agg(
        F.max("count")
    ).collect()[0][0] == 1


def test_seen_filter_probe_equivalent_after_compaction(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("probe"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng.run(max_rounds=4)
    from pyspark.sql import functions as F

    cands = (
        eng.store.read_or_empty("seen", SEEN)
        .select("url_canon")
        .unionByName(spark.createDataFrame([("https://nowhere.example/x",)], ["url_canon"]))
    )
    before = {r.url_canon for r in eng.seen.filter_unseen(cands).collect()}
    eng.seen.compact_filters(99)
    after = {r.url_canon for r in eng.seen.filter_unseen(cands).collect()}
    assert before == after == {"https://nowhere.example/x"}
