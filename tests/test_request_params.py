"""U4/P15 request surface: deterministic UA/proxy rotation per
(url, retry) and meta propagation of parent context (page counters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspider_spark import params
from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import FRONTIER
from pyspider_spark.synth import GraphSpec


def _reqs(spark, rows):
    return spark.createDataFrame(rows, ["url_canon", "retries"])


def test_ua_proxy_deterministic_per_url_and_retry(spark):
    rows = [(f"https://h{i}/u{i}", r) for i in range(40) for r in (0, 1)]
    a = params.with_request_params(_reqs(spark, rows)).collect()
    b = params.with_request_params(_reqs(spark, rows)).collect()
    assert [(r.ua, r.proxy) for r in a] == [(r.ua, r.proxy) for r in b]
    byline = {(r.url_canon, r.retries): (r.ua, r.proxy) for r in a}
    # a retry re-rolls the pick for at least some URLs (rotation works)
    changed = sum(
        1 for i in range(40)
        if byline[(f"https://h{i}/u{i}", 0)] != byline[(f"https://h{i}/u{i}", 1)]
    )
    assert changed > 10
    # picks cover the pools (not a constant choice)
    assert len({ua for ua, _ in byline.values()}) >= 3
    assert len({p for _, p in byline.values()}) >= 3
    # every pick comes from the declared pools
    assert {ua for ua, _ in byline.values()} <= set(params.UA_POOL)
    assert {p for _, p in byline.values()} <= set(params.PROXY_POOL)


def test_headers_carry_ua(spark):
    df = params.with_request_params(_reqs(spark, [("https://h/x", 0)]))
    r = df.collect()[0]
    assert r.headers["User-Agent"] == r.ua
    assert "Accept" in r.headers


def test_anti_bot_params_deterministic_and_rerolled(spark):
    """U4 risk-service surrogate (reference service/pdd_risk.py:16-53):
    nano_fp / anti_content are stable per (url, retry), re-rolled on
    retry, distinct across URLs, and ride in the headers map the way
    the reference's spiders send them."""
    rows = [(f"https://h{i}/u{i}", r) for i in range(20) for r in (0, 1)]
    a = params.with_request_params(_reqs(spark, rows)).collect()
    b = params.with_request_params(_reqs(spark, rows)).collect()
    assert [(r.nano_fp, r.anti_content) for r in a] == [
        (r.nano_fp, r.anti_content) for r in b
    ], "anti-bot params must be deterministic per (url, retry)"
    byline = {(r.url_canon, r.retries): (r.nano_fp, r.anti_content) for r in a}
    # every retry re-rolls both tokens (hash of a changed key)
    for i in range(20):
        u = f"https://h{i}/u{i}"
        assert byline[(u, 0)] != byline[(u, 1)]
    # tokens are per-request, not constant
    assert len({v[0] for v in byline.values()}) == len(byline)
    assert len({v[1] for v in byline.values()}) == len(byline)
    # headers carry them: Anti-Content header + nano_fp cookie
    for r in a:
        assert r.headers["Anti-Content"] == r.anti_content
        assert r.headers["Cookie"] == f"nano_fp={r.nano_fp}"


def test_anti_content_depends_on_ua_and_fp(spark):
    """anti_content hashes the same inputs the reference's risk call
    sends (ua, cookie fp, storage fp, href, screen) — changing the UA
    or the fp must change the token."""
    from pyspark.sql import functions as F

    df = _reqs(spark, [("https://h/x", 0)])
    base = df.select(
        params.anti_content_col(F.lit("ua-one"), F.lit("fp-one")).alias("t")
    ).collect()[0].t
    other_ua = df.select(
        params.anti_content_col(F.lit("ua-two"), F.lit("fp-one")).alias("t")
    ).collect()[0].t
    other_fp = df.select(
        params.anti_content_col(F.lit("ua-one"), F.lit("fp-two")).alias("t")
    ).collect()[0].t
    assert base != other_ua and base != other_fp


def test_meta_carries_page_counters_e2e(spark, tmp_path_factory):
    """After a crawl, every api-stage frontier row discovered via
    pagination carries its (cat, page) context in meta, matching the
    templated URL — the stage reads context from meta, not only from
    the body echo (reference common/example.py:43,57-59)."""
    wd = str(tmp_path_factory.mktemp("meta"))
    eng = CrawlEngine(spark, wd, GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="meta1"),
                      n_seen_partitions=4)
    eng.run(max_rounds=4)
    fr = eng.store.read_or_empty("frontier", FRONTIER)
    api = fr.filter(
        (F.col("stage") == "api") & F.col("meta").isNotNull()
        & F.element_at("meta", "page").isNotNull()
    ).select(
        "url_canon",
        F.element_at("meta", "cat").alias("mcat"),
        F.element_at("meta", "page").alias("mpage"),
        F.regexp_extract("url_canon", r"cat=(\d+)", 1).alias("ucat"),
        F.regexp_extract("url_canon", r"page=(\d+)", 1).alias("upage"),
    )
    rows = api.collect()
    assert len(rows) > 0, "pagination must enqueue meta-carrying api rows"
    for r in rows:
        assert r.mcat == r.ucat and r.mpage == r.upage, r
    # link rows carry their parent in meta
    linked = fr.filter(F.col("lineage").startswith("https://")).limit(20).collect()
    for r in linked:
        assert r.meta is not None and r.meta.get("parent") == r.lineage
