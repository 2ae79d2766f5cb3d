"""S9/S11 sink adapters: JDBC against embedded Derby (real
df.write.jdbc round-trip) and the Kafka framing via its file-backed
stand-in, both attached as TableStore mirrors during a crawl."""

from __future__ import annotations

import json
import os

import pytest

from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import ITEMS
from pyspider_spark.sinks import JdbcSink, JsonFileSink, KafkaSink
from pyspider_spark.synth import GraphSpec

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="sinks1")


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("jdbc"))
    db = f"jdbc:derby:memory:sinkdb_{os.path.basename(wd)};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng.store.add_mirror(JdbcSink(db, props, table_prefix="crawl_"), tables={"metrics"})
    stats = eng.run(max_rounds=3)
    back = spark.read.jdbc(db, "crawl_metrics", properties=props)
    got = {r.round: r.popped for r in back.collect()}
    want = {s.round: s.popped for s in stats}
    assert got == want and len(got) == 3


def test_kafka_framing_via_file_standin(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("kfk"))
    out = str(tmp_path_factory.mktemp("kfk_topic"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng.store.add_mirror(JsonFileSink(out), tables={"items"})
    eng.run(max_rounds=3)
    mirrored = spark.read.json(f"{out}/items")
    n_items = eng.store.read_or_empty("items", ITEMS).count()
    assert mirrored.count() == n_items > 0
    row = mirrored.first()
    # KafkaSink contract: key = first item column, value = full row JSON
    payload = json.loads(row.value)
    assert set(payload) == {f.name for f in ITEMS.fields}
    assert row.key == payload[ITEMS.fields[0].name]


def test_kafka_frame_shape(spark):
    df = spark.createDataFrame([("u1", 7)], ["url_canon", "n"])
    frame = KafkaSink("broker:9092").frame("t", df)
    assert frame.columns == ["key", "value"]
    r = frame.first()
    assert r.key == "u1" and json.loads(r.value) == {"url_canon": "u1", "n": 7}
