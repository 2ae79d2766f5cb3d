"""Per-request external parameters (U4/P15): UA rotation, proxy
rotation, header assembly — deterministic hash-derived surrogates.

The reference fetches a random UA from a UA service and a proxy from a
proxy pool per request (reference common/spider.py:69-105,
utils/proxy.py:307-308), plus anti-bot params from a risk service
(service/pdd_risk.py:6-53). Random choice is banned here (resume must
be byte-identical), so the pick is hash-derived from (url_canon,
retries): stable per attempt, re-rolled on every retry — the same
practical effect as the reference's random rotation (a blocked UA/proxy
is not reused on retry) with exact replayability.

A real deployment swaps the POOLS for live service calls inside the
fetch batch (fetch.py's documented swap point); the columns, their
distribution and the per-(url, retry) determinism are the contract."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# surrogate pools (≙ the reference's default_ua dict + proxy endpoints)
UA_POOL = [
    "Mozilla/5.0 (Linux; Android 11) AppleWebKit/537.36 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 15_0 like Mac OS X) Mobile/15E148",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_2) Version/16.3 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:115.0) Gecko/20100101 Firefox/115.0",
]

PROXY_POOL = [f"http://proxy-{i}.pool.invalid:8080" for i in range(8)]


def _pick(url_col, retries_col, salt: str, pool_size: int):
    """Deterministic pool index per (url, retry attempt) — JVM-side."""
    key = F.concat_ws(":", url_col, retries_col.cast("string"), F.lit(salt))
    return F.pmod(F.xxhash64(key), F.lit(pool_size)).cast("int")


def ua_col(url_col=None, retries_col=None):
    url_col = F.col("url_canon") if url_col is None else url_col
    retries_col = F.col("retries") if retries_col is None else retries_col
    idx = _pick(url_col, retries_col, "ua", len(UA_POOL))
    return F.array(*[F.lit(u) for u in UA_POOL])[idx]


def proxy_col(url_col=None, retries_col=None):
    url_col = F.col("url_canon") if url_col is None else url_col
    retries_col = F.col("retries") if retries_col is None else retries_col
    idx = _pick(url_col, retries_col, "proxy", len(PROXY_POOL))
    return F.array(*[F.lit(p) for p in PROXY_POOL])[idx]


SCREEN = "1920,1040"  # reference get_anticontent default screen param


def nano_fp_col(url_col=None, retries_col=None):
    """Deterministic surrogate for the risk service's browser
    fingerprint (reference ``get_nano_fp``, service/pdd_risk.py:16-24):
    an opaque per-request token, stable per (url, retry attempt) and
    re-rolled on retry — md5 hex of the keyed request identity."""
    url_col = F.col("url_canon") if url_col is None else url_col
    retries_col = F.col("retries") if retries_col is None else retries_col
    return F.md5(
        F.concat_ws(":", url_col, retries_col.cast("string"), F.lit("nano_fp"))
    )


def anti_content_col(ua, nano_fp, url_col=None):
    """Deterministic surrogate for the risk service's anti-bot token
    (reference ``get_anticontent``, service/pdd_risk.py:26-53). The
    reference derives it from (nano_cookie_fp, nano_storage_fp, api_uid,
    ua, href, page, screen); this surrogate hashes the same inputs —
    cookie and storage fp are both ``nano_fp`` exactly as the reference
    passes them — so the token changes whenever any input would."""
    url_col = F.col("url_canon") if url_col is None else url_col
    return F.md5(
        F.concat_ws("|", nano_fp, nano_fp, ua, url_col, F.lit(SCREEN))
    )


def headers_col(ua, nano_fp=None, anti_content=None):
    """Request-header map (≙ the reference's RequestBody headers,
    common/response.py:7-15): UA + static accept headers, plus the
    anti-bot params when supplied — Anti-Content as its own header and
    nano_fp as a cookie, the shape the reference's spiders send them."""
    pairs = [
        (F.lit("User-Agent"), ua),
        (F.lit("Accept"), F.lit("text/html,application/json;q=0.9,*/*;q=0.8")),
        (F.lit("Accept-Language"), F.lit("en-US,en;q=0.5")),
    ]
    if anti_content is not None:
        pairs.append((F.lit("Anti-Content"), anti_content))
    if nano_fp is not None:
        pairs.append((F.lit("Cookie"), F.concat(F.lit("nano_fp="), nano_fp)))
    return F.create_map(*[c for kv in pairs for c in kv])


def with_request_params(popped: DataFrame) -> DataFrame:
    """Attach ua / proxy / nano_fp / anti_content / headers columns to a
    popped batch (the full RequestBody surface a real fetcher consumes,
    U4: UA+proxy rotation and the risk-service params)."""
    ua = ua_col()
    return (
        popped.withColumn("ua", ua)
        .withColumn("proxy", proxy_col())
        .withColumn("nano_fp", nano_fp_col())
        .withColumn(
            "anti_content", anti_content_col(F.col("ua"), F.col("nano_fp"))
        )
        .withColumn(
            "headers",
            headers_col(F.col("ua"), F.col("nano_fp"), F.col("anti_content")),
        )
    )
