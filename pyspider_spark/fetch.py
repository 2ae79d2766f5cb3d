"""Fetcher: Arrow-batched fetch (operator S4 in SURVEY.md §2.1).

Two transports behind one ``mapInPandas`` surface — one Python process
per partition, Arrow batches in and out, zero per-row serialization:

- ``sim`` (default): the deterministic graph oracle
  (:mod:`pyspider_spark.synth`) replaces the reference's aiohttp fetch
  (reference common/request.py:58-92). This is what every correctness
  test replays byte-identically.
- ``http``: a REAL network transport — a thread pool of stdlib urllib
  requests per Arrow batch (pool size ≙ the reference's
  ``Settings.concurrency`` semaphore, common/settings.py:6 +
  common/spider.py:44,138), sending each row's ua/proxy/anti-bot
  headers (params.with_request_params). ``base_override`` routes every
  request to a fixed origin with the original host in the Host header
  (reverse-proxy style) — how the sandbox e2e test drives the whole
  engine over real HTTP against a localhost server, and how a
  deployment can point the engine at a proxy fleet. Network errors and
  timeouts map to status 599 (retryable, ≥500 like the reference's
  except-path, common/spider.py:147-156).

Image payloads: an ``img``-stage fetch materializes the deterministic
image row (bytes/w/h/fmt/caption/phash — BASELINE.json input_hint) in a
second ``mapInPandas`` pass over only the img-stage rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from . import synth
from .schemas import FETCH_RESULTS, IMAGES

_FETCH_COLS = [
    "url_canon",
    "host",
    "stage",
    "priority",
    "exetime",
    "retries",
    "max_retries",
    "meta",
]


# per-request external params (U4/P15) riding along for the real
# fetcher: ua / proxy / anti-bot tokens / headers are consumed inside
# the batch and dropped from the result (FETCH_RESULTS is unchanged)
_PARAM_COLS = ["ua", "proxy", "nano_fp", "anti_content", "headers"]


HTTP_POOL_SIZE = 20  # ≙ reference Settings.concurrency (settings.py:6)
HTTP_TIMEOUT_S = 5.0  # ≙ reference Settings.timeout (settings.py:12)


def run_fetch(
    popped: DataFrame,
    spec: synth.GraphSpec,
    transport: str = "sim",
    http_opts: dict | None = None,
) -> DataFrame:
    """popped frontier rows -> FETCH_RESULTS rows."""
    if transport not in ("sim", "http"):
        # a typo must not silently fabricate synthetic crawl data
        raise ValueError(f"unknown transport {transport!r}: use 'sim' or 'http'")
    cols = _FETCH_COLS + [c for c in _PARAM_COLS if c in popped.columns]
    opts = dict(http_opts or {})

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if transport == "http":
                yield http_fetch_batch(pdf, **opts)
            else:
                yield _fetch_batch(pdf, spec)

    return popped.select(*cols).mapInPandas(fetch_partition, schema=FETCH_RESULTS)


def _http_one(
    url: str, headers: dict, timeout_s: float, proxy: str | None = None
) -> tuple[int, str]:
    """One GET, stdlib-only. HTTP errors return their real status+body;
    transport errors (refused, DNS, timeout) return 599 — the engine's
    retry predicate is status >= 500, matching the reference's
    catch-all retry (common/spider.py:147-156). ``proxy`` routes the
    request through a forward proxy (per-row rotation)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers, method="GET")
    opener = (
        urllib.request.build_opener(
            urllib.request.ProxyHandler({"http": proxy, "https": proxy})
        )
        if proxy
        else urllib.request.build_opener()
    )
    from .htmlparse import sniff_decode

    try:
        with opener.open(req, timeout=timeout_s) as resp:
            # charset-sniffed bytes→str boundary (BOM > header charset
            # > meta prescan > utf-8), always errors='replace'
            return int(resp.status), sniff_decode(
                resp.read(), resp.headers.get("Content-Type")
            )
    except urllib.error.HTTPError as e:
        try:
            body = sniff_decode(e.read(), e.headers.get("Content-Type"))
        except Exception:
            body = ""
        return int(e.code), body
    except Exception:
        return 599, ""


def http_fetch_batch(
    pdf: pd.DataFrame,
    timeout_s: float = HTTP_TIMEOUT_S,
    pool_size: int = HTTP_POOL_SIZE,
    base_override: str | None = None,
    use_proxies: bool = False,
) -> pd.DataFrame:
    """REAL-network fetch of one Arrow batch: a thread pool (the
    reference's asyncio.Semaphore concurrency bound re-expressed) of
    urllib GETs carrying each row's request params. ``base_override``
    (e.g. ``http://127.0.0.1:8907``) swaps the origin and carries the
    original host in BOTH the Host header (standard reverse-proxy
    routing — nginx/envoy route on it) and X-Original-Host (explicit).
    ``use_proxies=True`` routes each request through the row's
    ``proxy`` column (per-(url, retry) rotation, params.proxy_col) —
    off by default because the surrogate pool is ``.invalid``
    placeholders; a deployment swaps params.PROXY_POOL for real
    endpoints and flips this on.

    ``out_links``/``image_refs`` come back None: over real HTTP the
    body is authoritative and the parse stages extract links from it
    (pair with ``CrawlEngine(html_parser=True)`` on non-synthetic
    pages)."""
    from concurrent.futures import ThreadPoolExecutor

    def job(row) -> tuple[int, str]:
        url = row["url_canon"]
        headers = dict(row["headers"] or {}) if "headers" in row else {}
        if "ua" in row and "User-Agent" not in headers:
            headers["User-Agent"] = row["ua"]
        if base_override:
            import urllib.parse

            parts = urllib.parse.urlsplit(url)
            url = urllib.parse.urlunsplit(
                urllib.parse.urlsplit(base_override)[:2]
                + (parts.path, parts.query, "")
            )
            headers["Host"] = parts.netloc
            headers["X-Original-Host"] = parts.netloc
        proxy = row.get("proxy") if use_proxies else None
        return _http_one(url, headers, timeout_s, proxy=proxy)

    rows = [row for _, row in pdf.iterrows()]
    if rows:
        with ThreadPoolExecutor(max_workers=min(pool_size, len(rows))) as ex:
            results = list(ex.map(job, rows))
    else:
        results = []
    out = pdf.copy()
    out["status"] = pd.Series(
        [s for s, _ in results], index=pdf.index, dtype="int32"
    )
    out["body"] = [b for _, b in results]
    # out_links is never parsed by the engine (links come from body);
    # image_refs for an img-stage fetch is the image id — the last URL
    # path segment by the engine's URL algebra (synth.img_url) — so a
    # successful real fetch materializes the same image row the sim does
    out["out_links"] = None
    out["image_refs"] = [
        [row["url_canon"].rsplit("/", 1)[-1]]
        if row.get("stage") == "img" and status == 200
        else None
        for (status, _), (_, row) in zip(results, pdf.iterrows())
    ]
    return out[[f.name for f in FETCH_RESULTS.fields]]


def _fetch_batch(pdf: pd.DataFrame, spec: synth.GraphSpec) -> pd.DataFrame:
    """The real-network swap point: an async HTTP pool would issue one
    request per row here using pdf['url_canon'] with pdf['ua'] /
    pdf['proxy'] / pdf['headers'] (when attached by
    params.with_request_params). The simulator derives the response
    from the URL alone — the params ride along so the swap is purely
    local to this function."""
    statuses, bodies, links, imgs = [], [], [], []
    for u in pdf["url_canon"]:
        r = synth.fetch_sim(spec, u)
        statuses.append(r["status"])
        bodies.append(r["body"])
        links.append(r["out_links"])
        imgs.append(r["image_refs"])
    out = pdf.copy()
    out["status"] = pd.Series(statuses, index=pdf.index, dtype="int32")
    out["body"] = bodies
    out["out_links"] = links
    out["image_refs"] = imgs
    return out[[f.name for f in FETCH_RESULTS.fields]]


IMAGE_OUT_BATCH = 256  # rows per yielded frame: image payloads are
# hundreds of KB, so emitting input-sized (10k-row) batches would build
# multi-GB Arrow buffers and OOM the executor's Arrow allocator.


def materialize_images(ok_results: DataFrame, spec: synth.GraphSpec) -> DataFrame:
    """img-stage fetch results -> IMAGES rows (bytes built per Arrow batch)."""
    img_rows = ok_results.filter("stage = 'img'").select("host", "image_refs")
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for host, refs in zip(pdf["host"], pdf["image_refs"]):
                for image_id in refs or []:
                    rows.append(synth.image_row(spec, host, image_id))
                    if len(rows) >= IMAGE_OUT_BATCH:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        yield pd.DataFrame(rows, columns=cols)

    return img_rows.mapInPandas(build, schema=IMAGES)
