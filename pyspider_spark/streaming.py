"""Structured Streaming surface over the engine's tables.

The engine is deliberately batch-iterative (SURVEY.md §2.8: frontier
state lives in snapshot tables, politeness deferral IS the late-data
story), but every table is an append-only directory tree — which is
exactly a file-source stream. This module lets downstream consumers
tail crawl output live (items/images/metrics landing per round) with
ordinary Structured Streaming, without the engine itself depending on
a streaming runtime:

    q = (tail_table(spark, workdir, "items")
         .groupBy("round").count()
         .writeStream.outputMode("complete")
         .format("memory").queryName("items_per_round")
         .trigger(availableNow=True).start())

Late/replayed data: a resumed crawl rolls table pointers back to the
last complete round AND physically prunes the crashed round's data dirs
(``TableStore.prune_abandoned``, invoked by ``restore_to_ledger``), so
the replayed round's re-appends are the only copy on disk and a
file-source stream sees each data file exactly once (the same guarantee
Iceberg streaming reads give). Streams started BEFORE the crash point
should be restarted after resume — their source checkpoint may
reference pruned files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import ITEMS, METRICS, TABLE_SCHEMAS


def tail_table(spark: SparkSession, workdir: str, name: str) -> DataFrame:
    """Streaming DataFrame over an engine table's data directories."""
    schema = TABLE_SCHEMAS[name]
    path = os.path.join(workdir, name, "data-*")
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(path)
    )


def items_per_round(spark: SparkSession, workdir: str) -> DataFrame:
    """Live per-round item counts (stateful streaming aggregation)."""
    return tail_table(spark, workdir, "items").groupBy("round").agg(
        F.count("*").alias("n_items")
    )


# ----------------------------------------------------------- seed ingest
# S10 (Kafka source): the reference consumes seed/task messages from
# Kafka (reference config/db_setup.py:184-196 producer; spiders push
# tasks through it). The engine's batch rounds don't NEED a streaming
# consumer — seeds land in the frontier table — but a deployment that
# already queues URLs on Kafka gets an optional ingest adapter here,
# mirroring the sink pair in sinks.py: same (key, value-JSON) framing,
# same file-backed stand-in for broker-less tests.

SEED_VALUE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("parent", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_FRAME = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), False),
    ]
)


def parse_seed_frames(frames: DataFrame) -> DataFrame:
    """(key, value-JSON) frames → (url, parent, meta) seed rows — the
    exact inverse of sinks.KafkaSink.frame, shared by the Kafka and
    file-backed sources so the test surface covers the broker path."""
    parsed = frames.select(
        F.from_json(F.col("value").cast("string"), SEED_VALUE).alias("v")
    )
    return parsed.select("v.url", "v.parent", "v.meta").filter(
        F.col("url").isNotNull()
    )


def kafka_seed_source(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Streaming seed rows from a Kafka topic (needs the
    spark-sql-kafka connector jar on the cluster, like sinks.KafkaSink;
    unit-tested broker-less via :func:`file_seed_source`, which shares
    :func:`parse_seed_frames`)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return parse_seed_frames(raw.select("key", "value"))


def file_seed_source(spark: SparkSession, root: str) -> DataFrame:
    """File-backed stand-in with the Kafka framing (the ingest-side
    twin of sinks.JsonFileSink): a streaming DataFrame of seed rows
    from JSON frame files staged under ``root``."""
    frames = spark.readStream.schema(_FRAME).json(root)
    return parse_seed_frames(frames)


def drain_seeds_into_engine(seed_stream: DataFrame, engine, next_round: int) -> int:
    """Drain everything currently staged on the stream into the
    engine's frontier (availableNow trigger + foreachBatch →
    ``CrawlEngine.ingest_urls``): each micro-batch is vetted exactly
    like discovered links (canonicalize → dedup → enqueued-set →
    robots) and appended as frontier rows due at ``next_round``.
    Returns the number of frontier rows added. Call between rounds —
    the next round's checkpoint pins the ingested rows."""
    added = []

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        added.append(engine.ingest_urls(batch_df, next_round))

    q = (
        seed_stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(added)


def _plan_has_aggregate(df: DataFrame) -> bool:
    """True iff the analyzed logical plan contains a Catalyst Aggregate
    node (class check node-by-node, not a plan-string grep)."""
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Aggregate":
            return True
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    return False


def run_once_to_memory(stream_df: DataFrame, query_name: str):
    """Drain everything currently on disk into an in-memory table
    (availableNow trigger) and return the finished query handle.

    Output mode is chosen from the plan: aggregated streams need
    ``complete`` (memory sink keeps the full result), raw table tails
    need ``append`` (Spark rejects complete without an aggregation).
    Detection walks the analyzed logical plan for an actual Aggregate
    node — a substring match on the rendered plan would false-positive
    on e.g. a column literally named 'Aggregate_x' and flip a raw tail
    into (rejected) complete mode."""
    aggregated = _plan_has_aggregate(stream_df)
    q = (
        stream_df.writeStream.outputMode("complete" if aggregated else "append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
