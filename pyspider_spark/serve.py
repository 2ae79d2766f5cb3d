"""Serving layer: cache-aside on-demand queries (SURVEY.md §3.3).

The reference exposes one public API — a FastAPI endpoint that serves a
keyword search with a Redis hash cache-aside (reference main.py:9-32,
app/api/jingxi.py:12-29): look the (name, key) pair up in the cache,
return the hit, otherwise run the spider request, store the JSON
response under the pair, and return it. TTL lives on the whole hash
(``RedisClient.set_cache``: hset + expire, reference
config/db_setup.py:21-45).

Spark-native re-expression: the cache is a snapshot-versioned
``serving_cache`` table keyed (name, key) with a ``cached_tick``
column; TTL is a filter (tick - cached_tick < ttl) and freshness is
last-write-wins via ``max_by`` — the same shape the engine's fetch
memo (S14/J2, loop._fetch_with_memo) uses, reused here at the serving
boundary. Time is a caller-supplied logical tick, not a wall clock, so
serving replays are deterministic (north rule: no nondeterminism
anywhere in the system).

Scale note (100 TB): a point GET reads the cache table with an exact
(name, key) equality filter — parquet min/max footer stats prune data
files, so the scan touches O(files containing the key), not the table;
the single collected row IS the endpoint's response, so a driver-side
collect here is the point, not an anti-pattern. Appends are
one-row-per-miss, compacted by TableStore snapshots like every other
table. A real deployment fronts this table with the actual Redis from
the reference — the ``CacheBackend`` seam below is that swap point.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import TableStore

SERVING_CACHE = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("cached_tick", T.LongType(), False),
    ]
)

DEFAULT_TTL_TICKS = 7  # reference cache_cycle=7 (config/db_setup.py:21)


class ServingCache:
    """Cache-aside over the TableStore (reference ``RedisClient.cache``,
    config/db_setup.py:38-45: get → miss? set + return value)."""

    def __init__(self, store: TableStore, ttl_ticks: int = DEFAULT_TTL_TICKS,
                 table: str = "serving_cache"):
        self.store = store
        self.ttl_ticks = ttl_ticks
        self.table = table

    def get(self, name: str, key: str, tick: int) -> str | None:
        """Point lookup: newest non-expired value for (name, key), or
        None. Equality filters push to the parquet scan (file pruning on
        footer min/max); ``max_by`` picks the newest write."""
        df = self.store.read_or_empty(self.table, SERVING_CACHE)
        hit = (
            df.filter(
                (F.col("name") == name)
                & (F.col("key") == key)
                & (F.col("cached_tick") > tick - self.ttl_ticks)
            )
            .agg(F.max_by("value", "cached_tick").alias("value"))
            .collect()[0]
        )
        return hit["value"]

    def put(self, name: str, key: str, value: str, tick: int) -> None:
        row = self.store.spark.createDataFrame(
            [(name, key, value, tick)], SERVING_CACHE
        )
        self.store.append(self.table, row)

    def cache(self, name: str, key: str, compute: Callable[[], str],
              tick: int) -> tuple[str, bool]:
        """The reference's ``cache()`` verb: returns (value, was_hit).
        ``compute`` runs only on miss/expiry."""
        hit = self.get(name, key, tick)
        if hit is not None:
            return hit, True
        value = compute()
        self.put(name, key, value, tick)
        return value, False


def keyword_search(items: DataFrame, keyword: str, page: int,
                   page_size: int = 10) -> DataFrame:
    """The served query itself (reference KeywordSearch.request →
    app/src/jingxi/keyword_search.py): items whose goods_name contains
    the keyword, paged deterministically. Pure DataFrame ops — filter
    pushes down, the page window is a bounded sort+limit."""
    from pyspark.sql import Window

    matched = items.filter(F.col("goods_name").contains(keyword))
    # deterministic page: TakeOrdered top (start+size) — a bounded
    # per-partition heap + driver merge, never a full sort — then slice
    # off the page with a row_number over that ≤(start+size)-row frame.
    start = (page - 1) * page_size
    head = matched.orderBy("asin_id").limit(start + page_size)
    w = Window.orderBy("asin_id")
    return (
        head.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > start)
        .drop("_rn")
    )


def serve_keyword_search(
    spark: SparkSession,
    store: TableStore,
    keyword: str,
    page: int,
    tick: int,
    ttl_ticks: int = DEFAULT_TTL_TICKS,
) -> dict:
    """End-to-end endpoint body (reference app/api/jingxi.py:12-29):
    cache key is f"{keyword}-{page}"; a hit short-circuits; a miss runs
    the query, JSON-serializes the rows (P16: ``to_json`` on the JVM —
    the driver only concatenates the already-serialized strings), caches
    and returns. Response envelope mirrors CommonResponse."""
    from .schemas import ITEMS

    cache = ServingCache(store, ttl_ticks=ttl_ticks)
    cache_key = f"{keyword}-{page}"

    def compute() -> str:
        items = store.read_or_empty("items", ITEMS)
        rows = keyword_search(items, keyword, page)
        # P16 JSON serialize, JVM-side: one to_json per row, collected
        # already-stringified (no Python dict marshalling per field)
        payload = rows.select(
            F.to_json(F.struct(*[F.col(f.name) for f in ITEMS.fields])).alias("js")
        ).collect()
        return "[" + ",".join(r["js"] for r in payload) + "]"

    value, was_hit = cache.cache("jingxi:keyword_search", cache_key, compute, tick)
    return {"code": 0, "cache_hit": was_hit, "data": json.loads(value)}
