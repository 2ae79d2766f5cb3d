"""Optional external sink adapters (S9 Kafka / S11 MySQL-JDBC).

The snapshot-versioned TableStore is the AUTHORITATIVE store (the
engine's correctness/resume contract lives there); these adapters
mirror appended rows OUT to external systems, matching the reference's
side-channel writes (Kafka producer config/db_setup.py:184-196, MySQL
pool config/db_setup.py:77-89,144-174). Attach with::

    engine.store.add_mirror(JdbcSink("jdbc:mysql://...", {...}),
                            tables={"items", "api_items"})

Each ``append`` then also lands in the sink — at-least-once on crash
replay (the replayed round re-mirrors; key the sink table or make the
consumer idempotent, exactly like the reference's Redis-keyed HSET).

KafkaSink needs the spark-sql-kafka connector jar on the cluster (not
bundled with plain pyspark); its row→(key,value-JSON) framing (P16
serialization) is pure DataFrame code and is unit-tested without a
broker via JsonFileSink, which shares the framing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KafkaSink:
    """df.write.format("kafka") mirror: one topic per table, value =
    row as JSON, key = the first column (stable partitioning by e.g.
    url_canon/image_id)."""

    def __init__(self, bootstrap_servers: str, topic_prefix: str = "pyspider."):
        self.bootstrap_servers = bootstrap_servers
        self.topic_prefix = topic_prefix

    def frame(self, name: str, df: DataFrame) -> DataFrame:
        key = F.col(df.columns[0]).cast("string").alias("key")
        value = F.to_json(F.struct(*df.columns)).alias("value")
        return df.select(key, value)

    def write(self, name: str, df: DataFrame) -> None:
        (
            self.frame(name, df)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", f"{self.topic_prefix}{name}")
            .save()
        )


class JdbcSink:
    """df.write.jdbc mirror (MySQL in the reference; any JDBC URL —
    tested against embedded Derby, the driver Spark bundles)."""

    def __init__(self, url: str, properties: dict | None = None, table_prefix: str = ""):
        self.url = url
        self.properties = properties or {}
        self.table_prefix = table_prefix

    def write(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").jdbc(
            self.url, f"{self.table_prefix}{name}", properties=self.properties
        )


class JsonFileSink:
    """File-backed stand-in with KafkaSink's exact framing — the unit
    test surface for the Kafka path when no broker/connector exists."""

    def __init__(self, root: str):
        self.root = root
        self._kafka = KafkaSink("unused")

    def write(self, name: str, df: DataFrame) -> None:
        self._kafka.frame(name, df).write.mode("append").json(
            f"{self.root}/{name}"
        )
