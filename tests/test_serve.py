"""Serving-layer cache-aside tests (SURVEY.md §3.3, reference
main.py:9-32 + app/api/jingxi.py:12-29 + config/db_setup.py:21-45)."""

import pyspark.sql.functions as F
import pytest

from pyspider_spark.schemas import ITEMS
from pyspider_spark.serve import ServingCache, keyword_search, serve_keyword_search
from pyspider_spark.tables import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    st = TableStore(spark, str(tmp_path / "serve"))
    rows = [
        (f"a{i:02d}", f"img{i}", f"goods widget-{i % 3}", "4.0", "$1.00",
         f"https://h/detail/a{i:02d}", "5", "c", f"https://h/detail/a{i:02d}", 0)
        for i in range(25)
    ]
    st.overwrite("items", spark.createDataFrame(rows, ITEMS))
    return st


def test_cache_aside_miss_then_hit(store):
    calls = []

    def compute():
        calls.append(1)
        return '{"n": 1}'

    c = ServingCache(store, ttl_ticks=3)
    v1, hit1 = c.cache("t", "k", compute, tick=0)
    v2, hit2 = c.cache("t", "k", compute, tick=1)
    assert (v1, hit1) == ('{"n": 1}', False)
    assert (v2, hit2) == ('{"n": 1}', True)
    assert len(calls) == 1  # compute ran once


def test_cache_ttl_expiry_and_last_write_wins(store):
    c = ServingCache(store, ttl_ticks=3)
    c.put("t", "k", "old", tick=0)
    c.put("t", "k", "new", tick=2)
    assert c.get("t", "k", tick=2) == "new"  # newest write wins
    assert c.get("t", "k", tick=4) == "new"  # tick 2 still fresh at 4
    assert c.get("t", "k", tick=6) is None  # both expired


def test_serving_cache_compaction_bounded(store, monkeypatch):
    """The put path folds the table once the snapshot's dir list passes
    COMPACT_AFTER_DIRS (VERDICT r2 #4/#10): dir count stays bounded over
    many puts, point lookups survive the bulk rewrite (kbucket-sorted),
    and expired rows are physically dropped."""
    from pyspider_spark import serve as serve_mod
    from pyspider_spark.serve import SERVING_CACHE

    monkeypatch.setattr(serve_mod, "COMPACT_AFTER_DIRS", 5)
    c = ServingCache(store, ttl_ticks=10)
    for i in range(30):
        c.put("t", f"k{i}", f"v{i}", tick=i)
        assert store.n_data_dirs(c.table) <= 6  # bound + the triggering put
    # point lookups after bulk compaction: fresh keys hit, stale miss
    assert c.get("t", "k29", tick=29) == "v29"
    assert c.get("t", "k25", tick=29) == "v25"
    assert c.get("t", "k0", tick=29) is None  # tick 0 expired at 29
    assert c.get("t", "nope", tick=29) is None
    # expired rows physically dropped: with compactions every ~5 puts
    # (ttl 10), nothing older than ~tick 15 can survive the last fold
    rows = store.read_or_empty(c.table, SERVING_CACHE).collect()
    assert rows and min(r.cached_tick for r in rows) > 10


def test_serving_cache_compaction_last_write_wins(store):
    """compact() keeps the newest value per key and stays equivalent
    for every future get."""
    c = ServingCache(store, ttl_ticks=10)
    c.put("t", "k", "old", tick=0)
    c.put("t", "k", "new", tick=3)
    c.compact(tick=4)
    assert store.n_data_dirs(c.table) == 1
    assert c.get("t", "k", tick=4) == "new"
    assert c.get("t", "k", tick=14) is None  # TTL still enforced


def test_keyword_search_paging_deterministic(store, spark):
    items = store.read("items")
    p1 = [r["asin_id"] for r in keyword_search(items, "widget-1", 1, 5).collect()]
    p2 = [r["asin_id"] for r in keyword_search(items, "widget-1", 2, 5).collect()]
    want = sorted(
        r["asin_id"]
        for r in items.filter(F.col("goods_name").contains("widget-1")).collect()
    )
    assert p1 == want[:5] and p2 == want[5:10]
    assert not set(p1) & set(p2)


def test_serve_endpoint_roundtrip(store, spark):
    r1 = serve_keyword_search(spark, store, "widget-2", 1, tick=0)
    r2 = serve_keyword_search(spark, store, "widget-2", 1, tick=1)
    assert r1["code"] == 0 and not r1["cache_hit"]
    assert r2["cache_hit"] and r2["data"] == r1["data"]
    assert all("widget-2" in row["goods_name"] for row in r1["data"])
    assert len(r1["data"]) > 0


def test_cache_disk_bounded_across_many_puts(store):
    """A long-running server must not grow disk/manifest without bound:
    after enough puts to trigger several compactions, the live data
    dirs AND the snapshot history stay bounded (compaction vacuums
    superseded dirs and truncates history — VERDICT r2 #3 analogue for
    the serving path)."""
    import json
    import os

    from pyspider_spark.serve import COMPACT_AFTER_DIRS

    c = ServingCache(store, ttl_ticks=10**6)
    n_puts = COMPACT_AFTER_DIRS * 3 + 5
    for i in range(n_puts):
        c.put("t", f"k{i}", f"v{i}", tick=i)
    assert store.n_data_dirs(c.table) <= COMPACT_AFTER_DIRS + 1
    # superseded per-put dirs are vacuumed, not just dropped from the
    # snapshot: on-disk dir count tracks the live snapshot
    tdir = os.path.join(store.root, c.table)
    assert len(os.listdir(tdir)) <= COMPACT_AFTER_DIRS + 2
    with open(os.path.join(store.root, "_manifests", f"{c.table}.json")) as f:
        m = json.load(f)
    assert len(m["snapshots"]) <= COMPACT_AFTER_DIRS + 2, "history must truncate"
    # every key within TTL stays servable after the folds
    assert c.get("t", "k0", tick=n_puts) == "v0"
    assert c.get("t", f"k{n_puts-1}", tick=n_puts) == f"v{n_puts-1}"


def test_keyword_search_page_clamped(store, spark):
    """page <= 0 is an endpoint boundary input: it must clamp to page 1,
    not raise out of limit(-n) or cache an empty page."""
    items = store.read_or_empty("items", ITEMS)
    p1 = [r.asin_id for r in keyword_search(items, "widget", 1).collect()]
    p0 = [r.asin_id for r in keyword_search(items, "widget", 0).collect()]
    pneg = [r.asin_id for r in keyword_search(items, "widget", -3).collect()]
    assert p1 and p0 == p1 and pneg == p1


def test_http_front_end_to_end(store, spark):
    """VERDICT r3 #10: the stdlib HTTP front over a real socket —
    401 without/with-forged token, login issues a bearer token,
    first search misses, second search serves from cache, and the
    payload matches the direct endpoint body."""
    import json
    import urllib.error
    import urllib.request

    from pyspider_spark import auth
    from pyspider_spark.serve import ApiServer

    users = {"admin": auth.hash_password("hunter2", salt="s1")}

    def req(url, data=None, token=None):
        r = urllib.request.Request(
            url, data=json.dumps(data).encode() if data is not None else None,
            headers={"Authorization": f"Bearer {token}"} if token else {},
            method="POST" if data is not None else "GET",
        )
        with urllib.request.urlopen(r, timeout=30) as resp:
            return resp.status, json.loads(resp.read())

    with ApiServer(spark, store, users, secret="sekrit") as srv:
        base = f"http://127.0.0.1:{srv.port}"

        # no token and forged token → 401
        for tok in (None, "not.a.jwt"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                req(f"{base}/api/keyword_search?keyword=widget&page=1", token=tok)
            assert ei.value.code == 401

        # bad password → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            req(f"{base}/token", data={"username": "admin", "password": "wrong"})
        assert ei.value.code == 401

        st, body = req(f"{base}/token",
                       data={"username": "admin", "password": "hunter2"})
        assert st == 200 and body["token_type"] == "bearer"
        token = body["access_token"]

        st, r1 = req(f"{base}/api/keyword_search?keyword=widget-1&page=1",
                     token=token)
        assert st == 200 and r1["code"] == 0 and not r1["cache_hit"]
        assert r1["data"] and all(
            "widget-1" in it["goods_name"] for it in r1["data"]
        )
        st, r2 = req(f"{base}/api/keyword_search?keyword=widget-1&page=1",
                     token=token)
        assert st == 200 and r2["cache_hit"] and r2["data"] == r1["data"]

        # unknown path → 404; bad page → 400
        for path, code in (
            ("/api/nope", 404),
            ("/api/keyword_search?keyword=w&page=zzz", 400),
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                req(f"{base}{path}", token=token)
            assert ei.value.code == code
