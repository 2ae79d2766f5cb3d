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
