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
(name, kbucket, key) equality filter — ``kbucket`` is a stable hash
bucket of the key, and compaction rewrites the table SORTED by
(name, kbucket), so parquet min/max footer stats prune data files/row
groups even after bulk rewrites collapse the one-file-per-put layout
that key-equality pruning alone relies on. The single collected row IS
the endpoint's response, so a driver-side collect here is the point,
not an anti-pattern. Appends are one-row-per-miss; once the snapshot's
data-dir list exceeds ``COMPACT_AFTER_DIRS`` the put path folds the
table down to the live TTL window (newest row per key), so file-listing
cost is bounded no matter how long the server runs. A real deployment
fronts this table with the actual Redis from the reference — the
``ServingCache`` seam is that swap point.
"""

from __future__ import annotations

import hashlib
import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import TableStore

SERVING_CACHE = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("kbucket", T.IntegerType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("cached_tick", T.LongType(), False),
    ]
)

DEFAULT_TTL_TICKS = 7  # reference cache_cycle=7 (config/db_setup.py:21)

N_KEY_BUCKETS = 64  # kbucket fan-out: enough for row-group pruning,
# small enough that a compacted table still writes few, dense files

COMPACT_AFTER_DIRS = 32  # put() folds the table once the snapshot's
# dir list exceeds this — bounds manifest/file-listing growth to O(1)


def _kbucket(key: str) -> int:
    """Stable hash bucket of a cache key (md5-derived — same value on
    any driver, never Python's salted hash())."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % N_KEY_BUCKETS


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
        None. The name/kbucket/key equality filters push to the parquet
        scan (file + row-group pruning on footer min/max — kbucket keeps
        pruning effective on bulk-compacted files); ``max_by`` picks the
        newest write."""
        df = self.store.read_or_empty(self.table, SERVING_CACHE)
        hit = (
            df.filter(
                (F.col("name") == name)
                & (F.col("kbucket") == _kbucket(key))
                & (F.col("key") == key)
                & (F.col("cached_tick") > tick - self.ttl_ticks)
            )
            .agg(F.max_by("value", "cached_tick").alias("value"))
            .collect()[0]
        )
        return hit["value"]

    def put(self, name: str, key: str, value: str, tick: int) -> None:
        # one driver-held row — pyarrow write, no Spark job (the
        # reference's hset is a sub-ms point write; a Spark job per put
        # would make every cache miss pay ~0.5 s of scheduling)
        self.store.append_rows(
            self.table,
            [{"name": name, "kbucket": _kbucket(key), "key": key,
              "value": value, "cached_tick": tick}],
            SERVING_CACHE,
        )
        if self.store.n_data_dirs(self.table) > COMPACT_AFTER_DIRS:
            self.compact(tick)

    def compact(self, tick: int) -> None:
        """Fold the cache to its live TTL window: newest row per
        (name, key) still fresh at ``tick``, rewritten as ONE overwrite
        snapshot sorted by (name, kbucket) so footer stats keep pruning
        point lookups. Content-equivalent for every future get (expired
        rows can never be served; max_by already ignores older rows)."""
        df = self.store.read_or_empty(self.table, SERVING_CACHE).filter(
            F.col("cached_tick") > tick - self.ttl_ticks
        )
        live = (
            df.groupBy("name", "kbucket", "key")
            .agg(
                F.max_by(
                    F.struct("value", "cached_tick"), F.col("cached_tick")
                ).alias("_c")
            )
            .select(
                "name", "kbucket", "key",
                F.col("_c.value").alias("value"),
                F.col("_c.cached_tick").alias("cached_tick"),
            )
            .sort("name", "kbucket")
        )
        self.store.overwrite(
            self.table, live.select(*[f.name for f in SERVING_CACHE.fields])
        )
        # drop superseded data dirs + truncate snapshot history: without
        # this the overwrite keeps every prior snapshot and per-put data
        # dir forever (disk O(total puts), manifest parse O(compactions)
        # per lookup). Safe here: the serving layer is the table's only
        # writer/reader and holds no pinned snapshot across requests.
        self.store.vacuum(self.table)

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
    # endpoint boundary input: page < 1 clamps to the first page
    # (limit(-n) would raise out of the endpoint body)
    start = (max(int(page), 1) - 1) * page_size
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

    page = max(int(page), 1)  # one clamp, one cache key per result
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


class ApiServer:
    """The reference's HTTP surface (main.py:9-32 + app/api/jingxi.py:
    12-29) as a stdlib ``http.server`` front — the deployment swap
    point for a real ASGI server:

    - ``POST /token`` {username, password} → HS256 bearer token after
      PBKDF2 verification (auth.py ≙ app/security.py:17-34);
    - ``GET /api/keyword_search?keyword=&page=`` behind the bearer
      check → cache-aside keyword search (serve_keyword_search); any
      absent/forged/expired token is a 401.

    Time is the server's logical tick — one increment per request, so
    replays are deterministic (single-threaded HTTPServer on purpose:
    request ordering IS the clock).
    """

    def __init__(self, spark: SparkSession, store: TableStore,
                 users: dict[str, str], secret: str,
                 ttl_ticks: int = DEFAULT_TTL_TICKS, port: int = 0):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from . import auth

        outer = self
        self.spark, self.store = spark, store
        self.users, self.secret, self.ttl_ticks = users, secret, ttl_ticks
        self._tick = 0

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet the test output
                pass

            def _send(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/token":
                    return self._send(404, {"detail": "not found"})
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                    creds = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, TypeError):
                    return self._send(400, {"detail": "bad request"})
                user = str(creds.get("username") or "")
                hashed = outer.users.get(user)
                if not hashed or not auth.verify_password(
                    str(creds.get("password") or ""), hashed
                ):
                    return self._send(
                        401, {"detail": "incorrect username or password"}
                    )
                token = auth.create_access_token(
                    user, outer.secret, outer._next_tick()
                )
                self._send(
                    200, {"access_token": token, "token_type": "bearer"}
                )

            def do_GET(self):
                from urllib.parse import parse_qs, urlsplit

                parts = urlsplit(self.path)
                if parts.path != "/api/keyword_search":
                    return self._send(404, {"detail": "not found"})
                tick = outer._next_tick()
                hdr = self.headers.get("Authorization") or ""
                sub = (
                    auth.decode_access_token(hdr[7:], outer.secret, tick)
                    if hdr.startswith("Bearer ")
                    else None
                )
                if sub is None:
                    return self._send(401, {"detail": "unauthorized"})
                qs = parse_qs(parts.query)
                try:
                    page = int(qs.get("page", ["1"])[0] or 1)
                except ValueError:
                    return self._send(400, {"detail": "bad page"})
                resp = serve_keyword_search(
                    outer.spark, outer.store,
                    qs.get("keyword", [""])[0], page, tick,
                    ttl_ticks=outer.ttl_ticks,
                )
                self._send(200, resp)

        self._httpd = HTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = None

    def _next_tick(self) -> int:
        self._tick += 1
        return self._tick

    def start(self) -> "ApiServer":
        import threading

        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def __enter__(self) -> "ApiServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
