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
    from pyspark.sql import functions as F

    return tail_table(spark, workdir, "items").groupBy("round").agg(
        F.count("*").alias("n_items")
    )


def run_once_to_memory(stream_df: DataFrame, query_name: str):
    """Drain everything currently on disk into an in-memory table
    (availableNow trigger) and return the finished query handle."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
