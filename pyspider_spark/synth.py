"""Deterministic synthetic web graph + fetch oracle (no network).

Replaces the reference's live HTTP fetch (reference common/request.py:58-92)
with a pure function of the canonical URL, shared verbatim by:

- the Spark fetcher (``fetch.py``: mapInPandas over Arrow batches), and
- the pure-Python oracle simulator (``tests/oracle_sim.py``),

so both see the identical web. Every quantity is hash-derived
(:mod:`pyspider_spark.hashing`) — no RNG, no wall clock — which is what
makes killed-and-resumed runs byte-identical (north rule).

URL shapes (one crawl "site" family, mirroring the reference's
list → detail / api pagination topology, reference
spiders/amazon/crawl_goods_list.py:97-104, common/example.py:51-59):

- ``https://host{h}.example/list/{c}/page/{p}``   HTML list page
- ``https://host{h}.example/detail/{d}``          HTML detail page (item)
- ``https://host{h}.example/api/items?cat={c}&page={p}``  JSONP API page
- ``https://host{h}.example/img/{image_id}``      image fetch
- ``https://host{h}.example/private/{k}``         robots-disallowed

Failure injection (rates from the reference's retry semantics,
common/spider.py:133-156 and captcha re-enqueue
spiders/amazon/crawl_goods_list.py:50-52): 5% HTTP 500 (retryable),
5% status-200 bodies containing the ``captchacharacters`` marker.
"""

from __future__ import annotations

from dataclasses import dataclass

from .hashing import h64, hid

CAPTCHA_MARKER = "captchacharacters"
JSONP_PREFIX = "jsonp_cb("  # fixed-width strip, reference jingxi_category_gather.py:34-36
JSONP_SUFFIX = ");"


@dataclass(frozen=True)
class GraphSpec:
    """Knobs for the synthetic web. Defaults sized for tests; bench scales
    n_hosts/chains up and the graph stays O(1) per URL to evaluate."""

    n_hosts: int = 3
    chains_per_host: int = 2          # list chains (categories) per host
    max_pages_per_chain: int = 4      # pagination depth cap (ref: caps 30-100)
    details_per_list: int = 3
    api_pages_per_chain: int = 3
    images_per_list: int = 2
    cross_links_per_list: int = 2     # links to other hosts' chains
    fail_rate_pct: int = 5            # HTTP 500
    captcha_rate_pct: int = 5         # 200 + captcha marker
    private_rate_pct: int = 10        # list pages that also link a /private/ URL
    skew_host: int | None = None      # if set, cross-links all point here
    seed_tag: str = "g1"              # namespaces all hashes
    img_scale: int = 1                # multiplies image dims (1 → 32-128px
                                      # test toys; 4-8 → realistic payload
                                      # sizes for compute-weighted benches)
    sales_chunk_size: int = 50        # Q12: sku ids merged per batch sales
                                      # request (ref jingxi_category_sales
                                      # .py:112-118 chunks 50 ids)
    crawl_delay_host0: float | None = 5.0  # robots Crawl-delay on host0's
                                      # rule (Q15). Effective per-round cap =
                                      # floor(ROUND_QUANTUM_S/delay); the 5.0
                                      # default caps at 12 ≥ host0's
                                      # concurrency 10, so the default spec's
                                      # pop set is delay-unconstrained —
                                      # tests raise it to force deferral

    def host(self, h: int) -> str:
        return f"host{h}.example"


# ---------------------------------------------------------------- url algebra
def list_url(spec: GraphSpec, h: int, c: int, p: int) -> str:
    return f"https://{spec.host(h)}/list/{c}/page/{p}"


def detail_url(spec: GraphSpec, h: int, d: str) -> str:
    return f"https://{spec.host(h)}/detail/{d}"


def api_url(spec: GraphSpec, h: int, c: int, p: int) -> str:
    return f"https://{spec.host(h)}/api/items?cat={c}&page={p}"


def img_url(spec: GraphSpec, h: int, image_id: str) -> str:
    return f"https://{spec.host(h)}/img/{image_id}"


# Q12 chunked batch requests (reference jingxi_category_sales.py:112-118
# merges 50 sku ids into ONE request). Separator is '.' — one of the
# four always-safe urlencode characters (_.-~), so the canonicalizer's
# percent-encoding pass leaves batch URLs untouched and the fetch
# simulator can split ids back out without url-decoding.
SALES_ID_SEP = "."


def sales_parent(host: str) -> str:
    """Lineage/meta parent recorded for batch sales requests — chunks
    combine skus from many api pages, so the 'parent' is the endpoint."""
    return f"https://{host}/api/sales"


def sales_url(host: str, ids: list[str]) -> str:
    return f"https://{host}/api/sales?ids={SALES_ID_SEP.join(ids)}"


def private_url(spec: GraphSpec, h: int, k: int) -> str:
    return f"https://{spec.host(h)}/private/{k}"


def stage_of(url_canon: str) -> str:
    """Derive the parse stage (≙ callback name, reference
    common/response.py:15) from the URL path."""
    path = url_canon.split("://", 1)[-1].split("/", 1)[-1]
    if path.split("?", 1)[0] == "api/sales":
        return "sales"  # Q12 batch endpoint, own parse stage
    head = path.split("/", 1)[0].split("?", 1)[0]
    return {
        "list": "list",
        "detail": "detail",
        "api": "api",
        "img": "img",
        "private": "list",
    }.get(head, "list")


def parse_synth_url(url_canon: str) -> dict:
    """Structured view of a synthetic URL (host index, kind, ids)."""
    rest = url_canon.split("://", 1)[-1]
    hostname, _, path_q = rest.partition("/")
    path, _, query = path_q.partition("?")
    parts = [p for p in path.split("/") if p]
    q = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
    h = int(hostname.split(".")[0].removeprefix("host")) if hostname.startswith("host") else -1
    kind = parts[0] if parts else ""
    return {"h": h, "host": hostname, "kind": kind, "parts": parts, "q": q}


# ------------------------------------------------------------- graph geometry
def chain_len(spec: GraphSpec, h: int, c: int) -> int:
    """Pagination chain length for (host, chain): 2..max_pages."""
    return 2 + h64(spec.seed_tag, "chain", str(h), str(c)) % max(
        spec.max_pages_per_chain - 1, 1
    )


def priority_of(url_canon: str) -> int:
    """Hash-derived priority 0..9 (FIXTURES.md §1)."""
    return h64("prio", url_canon) % 10


def seed_exetime(url_canon: str) -> int:
    """Seed rows get a small hash-derived exetime tick (age spread)."""
    return h64("exe", url_canon) % 3


# ------------------------------------------------------------------ fetch sim
def fetch_sim(spec: GraphSpec, url_canon: str) -> dict:
    """The deterministic 'web server'. Returns
    ``{status, body, out_links, image_refs, item}`` for any synthetic URL.

    body is authoritative for the engine's parse stages (links/items are
    re-extracted from body by Spark column expressions); out_links /
    image_refs / item are the parse-free ground truth used by the oracle
    and by tests that validate the parsers.
    """
    u = parse_synth_url(url_canon)
    h, kind = u["h"], u["kind"]
    roll = h64(spec.seed_tag, "fetch", url_canon) % 100
    if roll < spec.fail_rate_pct:
        return {"status": 500, "body": "", "out_links": [], "image_refs": [], "item": None}
    captcha = roll < spec.fail_rate_pct + spec.captcha_rate_pct

    out_links: list[str] = []
    image_refs: list[str] = []
    item = None
    body = ""

    if kind == "list":
        c, p = int(u["parts"][1]), int(u["parts"][3])
        n = chain_len(spec, h, c)
        if captcha:
            return {
                "status": 200,
                "body": f"<html><body>{CAPTCHA_MARKER}</body></html>",
                "out_links": [],
                "image_refs": [],
                "item": None,
            }
        if p < n:  # next page (pagination, ref crawl_goods_list.py:97-104)
            out_links.append(list_url(spec, h, c, p + 1))
        for i in range(spec.details_per_list):
            d = hid(spec.seed_tag, "detail", str(h), str(c), str(p), str(i))
            out_links.append(detail_url(spec, h, d))
        if p == 1:  # chain head links its API mirror
            out_links.append(api_url(spec, h, c, 1))
        for i in range(spec.cross_links_per_list):
            if spec.skew_host is not None:
                th = spec.skew_host
            else:
                th = h64(spec.seed_tag, "x", url_canon, str(i)) % spec.n_hosts
            tc = h64(spec.seed_tag, "xc", url_canon, str(i)) % spec.chains_per_host
            tp = 1 + h64(spec.seed_tag, "xp", url_canon, str(i)) % chain_len(spec, th, tc)
            out_links.append(list_url(spec, th, tc, tp))
        if h64(spec.seed_tag, "priv", url_canon) % 100 < spec.private_rate_pct:
            out_links.append(private_url(spec, h, h64("pk", url_canon) % 50))
        for i in range(spec.images_per_list):
            image_refs.append(hid(spec.seed_tag, "img", str(h), str(c), str(p), str(i)))
        links_html = "".join(f'<a href="{x}">link</a>' for x in out_links)
        imgs_html = "".join(
            f'<img src="{img_url(spec, h, i)}" alt="{i}"/>' for i in image_refs
        )
        body = f"<html><body><div class=p>{links_html}{imgs_html}</div></body></html>"

    elif kind == "detail":
        d = u["parts"][1]
        if captcha:
            return {
                "status": 200,
                "body": f"<html><body>{CAPTCHA_MARKER}</body></html>",
                "out_links": [],
                "image_refs": [],
                "item": None,
            }
        item = make_item(spec, h, d)
        body = (
            "<html><body>"
            f'<span id="asin">{item["asin_id"]}</span>'
            f'<span id="name">{item["goods_name"]}</span>'
            f'<span id="price">{item["price"] or ""}</span>'
            f'<span id="star">{item["star_rating"] or ""}</span>'
            f'<span id="img">{item["img_url"]}</span>'
            f'<span id="dlink">{item["goods_detail_link"]}</span>'
            f'<span id="cnum">{item["goods_comment_num"]}</span>'
            f'<span id="clink">{item["goods_comment_link"]}</span>'
            "</body></html>"
        )

    elif kind == "api" and u["parts"][1] == "sales":
        # Q12 batch endpoint: one request answers for every id in the
        # chunk (reference jingxi_category_sales.py:112-118 merges 50
        # sku ids into one request, response keyed per id)
        if captcha:
            body = '{"errorMsg": "risk control"}'
            return {
                "status": 200,
                "body": CAPTCHA_MARKER + body,
                "out_links": [],
                "image_refs": [],
                "item": None,
            }
        ids = u["q"]["ids"].split(SALES_ID_SEP) if u["q"].get("ids") else []
        rows = [
            f'{{"sku": "{d}", "stock": {h64("stk", d) % 100}, '
            f'"sale_price_cents": {h64("sp", d) % 100000}}}'
            for d in ids
        ]
        body = f'{{"sales": [{", ".join(rows)}]}}'

    elif kind == "api":
        c, p = int(u["q"]["cat"]), int(u["q"]["page"])
        if captcha:
            body = JSONP_PREFIX + '{"errorMsg": "risk control"}' + JSONP_SUFFIX
            return {
                "status": 200,
                "body": CAPTCHA_MARKER + body,
                "out_links": [],
                "image_refs": [],
                "item": None,
            }
        rows = []
        if p <= spec.api_pages_per_chain:  # empty page ends pagination
            for i in range(2):
                d = hid(spec.seed_tag, "apiitem", str(h), str(c), str(p), str(i))
                rows.append(
                    f'{{"sku": "{d}", "tuancount": {h64("tc", d) % 1000}, '
                    f'"salecount": {h64("sc", d) % 500}}}'
                )
            out_links.append(api_url(spec, h, c, p + 1))
        body = (
            JSONP_PREFIX
            + f'{{"result": {{"data": {{"cat": {c}, "page": {p}, "items": [{", ".join(rows)}]}}}}}}'
            + JSONP_SUFFIX
        )

    elif kind == "img":
        image_refs = [u["parts"][1]]
        body = ""

    elif kind == "private":  # never fetched if robots respected; body empty
        body = "<html><body>private</body></html>"

    return {
        "status": 200,
        "body": body,
        "out_links": out_links,
        "image_refs": image_refs,
        "item": item,
    }


def make_item(spec: GraphSpec, h: int, d: str) -> dict:
    """Item dict with the reference's amazon goods schema
    (spiders/amazon/crawl_goods_list.py:58-91); hash-chosen fields nulled
    to exercise coalesce('') defaults (FIXTURES.md §6)."""
    price_null = h64(spec.seed_tag, "pn", d) % 10 == 0
    star_null = h64(spec.seed_tag, "sn", d) % 10 == 1
    return {
        "asin_id": d,
        "img_url": img_url(spec, h, hid(spec.seed_tag, "itemimg", d)),
        "goods_name": f"goods {d[:8]}",
        "star_rating": None if star_null else f"{(h64('st', d) % 40 + 10) / 10:.1f}",
        "price": None if price_null else f"${(h64('pr', d) % 9000 + 100) / 100:.2f}",
        "goods_detail_link": detail_url(spec, h, d),
        "goods_comment_num": str(h64("cn", d) % 5000),
        "goods_comment_link": detail_url(spec, h, d) + "#comments",
        "host": spec.host(h),
    }


# ----------------------------------------------------------- fixtures/dims
def seed_urls(spec: GraphSpec) -> list[str]:
    """Round-0 seeds: page 1 of every chain, written in canonicalization-
    hostile form (mixed case, unsorted params, fragments — FIXTURES.md §1)."""
    seeds = []
    for h in range(spec.n_hosts):
        for c in range(spec.chains_per_host):
            raw = f"HTTPS://Host{h}.Example:443/list/{c}/page/1#top"
            seeds.append(raw)
    return seeds


def config_rows(spec: GraphSpec) -> list[dict]:
    """Per-host politeness (reference Settings defaults common/settings.py:5-12;
    host0 is the 'amazon-like' polite host, crawl_cate_link.py:19-24)."""
    rows = []
    for h in range(spec.n_hosts):
        polite = h == 0
        rows.append(
            {
                "host": spec.host(h),
                "concurrency": 10 if polite else 20,
                "delay_s": 1.5 if polite else 0.5,
                "timeout_s": 5.0,
                "max_retries": 3,
                "pop_budget": 1000,
            }
        )
    return rows


def robots_rows(spec: GraphSpec) -> list[dict]:
    """Disallow /private/ on every host; host0 (the polite host) also
    carries a Crawl-delay (north-rule robots; FIXTURES.md §5)."""
    rows = []
    for h in range(spec.n_hosts):
        rows.append(
            {
                "host": spec.host(h),
                "path_prefix": "/private/",
                "allow": False,
                "crawl_delay_s": spec.crawl_delay_host0 if h == 0 else None,
            }
        )
    return rows


def image_row(spec: GraphSpec, host: str, image_id: str) -> dict:
    """Materialize the deterministic image payload for an image_id
    (schema = BASELINE.json input_hint; built lazily at fetch time)."""
    from . import imaging  # local import keeps synth usable without numpy

    w = (32, 64, 128)[h64("w", image_id) % 3] * spec.img_scale
    h_ = (32, 64, 128)[h64("h", image_id) % 3] * spec.img_scale
    fmt = "jpeg" if h64("fmt", image_id) % 2 else "png"
    rgb = imaging.synth_image(image_id, w, h_)
    return {
        "image_id": image_id,
        "bytes": imaging.encode(rgb, fmt),
        "w": w,
        "h": h_,
        "fmt": fmt,
        "caption": f"caption of image {image_id} on {host}",
        "phash": imaging.phash64(rgb),
    }
