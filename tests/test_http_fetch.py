"""S4 real-network transport (reference common/request.py:58-92): the
thread-pooled urllib fetch path, driven end-to-end against a LOCAL
HTTP server that serves the deterministic synthetic graph — proving
the documented swap point actually swaps: a full crawl over real HTTP
is byte-identical to the simulated crawl."""

from __future__ import annotations

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from pyspider_spark import synth
from pyspider_spark.fetch import http_fetch_batch
from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import IMAGES, ITEMS, METRICS, SEEN
from pyspider_spark.synth import GraphSpec

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="httpe2e")


class _SynthHandler(BaseHTTPRequestHandler):
    """Serves synth.fetch_sim over real HTTP: the original host rides
    in X-Original-Host (the fetcher's base_override reverse-proxy
    contract), statuses/bodies are the oracle's."""

    seen_headers: list[dict] = []

    def do_GET(self):  # noqa: N802 (stdlib naming)
        if self.path.startswith("http://") or self.path.startswith("https://"):
            # forward-proxy mode: urllib sends the absolute URI as the
            # request line when routed through ProxyHandler
            from urllib.parse import urlsplit

            p = urlsplit(self.path)
            host, path = p.netloc, p.path + (f"?{p.query}" if p.query else "")
            url = f"https://{host}{path}"
        else:
            # reverse-proxy mode: route on Host (the standard contract),
            # X-Original-Host kept as the explicit fallback
            host = self.headers.get("Host", "")
            if host.startswith("127.0.0.1"):
                host = self.headers.get("X-Original-Host", "")
            url = f"https://{host}{self.path}"
        type(self).seen_headers.append(dict(self.headers))
        r = synth.fetch_sim(SPEC, url)
        body = r["body"].encode("utf-8")
        self.send_response(r["status"])
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture(scope="module")
def synth_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SynthHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _fetch_frame(urls, stages, headers=None):
    """A popped-batch frame with the engine's full fetch column set."""
    n = len(urls)
    return pd.DataFrame(
        {
            "url_canon": urls,
            "host": [u.split("/")[2] for u in urls],
            "stage": stages,
            "priority": [5] * n,
            "exetime": [0] * n,
            "retries": [0] * n,
            "max_retries": [3] * n,
            "meta": [None] * n,
            "ua": ["UA-TEST/1.0"] * n,
            "headers": headers or [{"User-Agent": "UA-TEST/1.0"}] * n,
        }
    )


def test_http_batch_statuses_headers_and_errors(synth_server):
    """Unit level (no Spark): real GETs return the oracle's
    status/body, request params (UA + anti-bot headers) reach the wire,
    and transport errors map to the retryable 599."""
    _SynthHandler.seen_headers = []
    urls = [
        "https://host0.example/list/0/page/1",
        "https://host1.example/detail/sku-x",
    ]
    pdf = _fetch_frame(
        urls,
        ["list", "detail"],
        headers=[
            {"User-Agent": "UA-TEST/1.0", "Anti-Content": "tok-1"},
            {"User-Agent": "UA-TEST/1.0", "Anti-Content": "tok-2"},
        ],
    )
    out = http_fetch_batch(pdf, base_override=synth_server)
    want = [synth.fetch_sim(SPEC, u) for u in urls]
    assert list(out["status"]) == [w["status"] for w in want]
    assert list(out["body"]) == [w["body"] for w in want]
    got_hdrs = _SynthHandler.seen_headers
    assert all(h.get("User-Agent") == "UA-TEST/1.0" for h in got_hdrs)
    assert {h.get("Anti-Content") for h in got_hdrs} == {"tok-1", "tok-2"}
    # img-stage ref derivation: the image id is the last path segment
    img = http_fetch_batch(
        _fetch_frame(["https://host0.example/img/img-abc123"], ["img"]),
        base_override=synth_server,
    )
    assert list(img["image_refs"])[0] == ["img-abc123"]
    # connection refused -> 599 (retryable like the reference's
    # catch-all except path)
    dead = http_fetch_batch(
        _fetch_frame(["https://h/x"], ["list"]),
        base_override="http://127.0.0.1:9",  # discard port, nothing listens
        timeout_s=1.0,
    )
    assert list(dead["status"]) == [599]


def _digest(eng, name, schema):
    df = eng.store.read_or_empty(name, schema)
    rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def test_http_transport_crawl_byte_identical_to_sim(
    spark, synth_server, tmp_path_factory
):
    """The whole engine over REAL HTTP (fetch → retry → parse → items
    → images → near-dup → metrics) equals the simulated crawl
    byte-for-byte — the real-network swap changes transport, nothing
    else."""
    wd_sim = str(tmp_path_factory.mktemp("sim"))
    a = CrawlEngine(spark, wd_sim, SPEC, n_seen_partitions=4)
    a.run(max_rounds=3)
    wd_http = str(tmp_path_factory.mktemp("http"))
    b = CrawlEngine(
        spark, wd_http, SPEC, n_seen_partitions=4,
        transport="http", http_opts={"base_override": synth_server},
    )
    b.run(max_rounds=3)
    for t, s in [
        ("seen", SEEN), ("items", ITEMS), ("images", IMAGES),
        ("metrics", METRICS),
    ]:
        assert _digest(a, t, s) == _digest(b, t, s), t


def test_http_host_header_reverse_proxy_contract(synth_server):
    """base_override must put the ORIGINAL host in the Host header —
    the routing key every standard reverse proxy (nginx/envoy) uses."""
    _SynthHandler.seen_headers = []
    url = "https://host0.example/list/0/page/1"
    out = http_fetch_batch(_fetch_frame([url], ["list"]), base_override=synth_server)
    assert list(out["status"]) == [synth.fetch_sim(SPEC, url)["status"]]
    h = _SynthHandler.seen_headers[-1]
    assert h.get("Host") == "host0.example"
    assert h.get("X-Original-Host") == "host0.example"


def test_http_per_row_proxy_rotation(synth_server):
    """use_proxies=True routes each request through the row's proxy
    column (forward-proxy absolute-URI form) — the per-(url, retry)
    rotation contract of params.proxy_col, actually on the wire."""
    urls = ["http://host0.example/list/0/page/1", "http://host1.example/detail/sku-x"]
    pdf = _fetch_frame(urls, ["list", "detail"])
    pdf["proxy"] = [synth_server, synth_server]
    out = http_fetch_batch(pdf, use_proxies=True)
    want = [synth.fetch_sim(SPEC, u.replace("http://", "https://")) for u in urls]
    assert list(out["status"]) == [w["status"] for w in want]
    assert list(out["body"]) == [w["body"] for w in want]
    # a dead proxy is a transport error -> 599 retryable, re-rolled on
    # retry by the deterministic rotation
    pdf_dead = _fetch_frame([urls[0]], ["list"])
    pdf_dead["proxy"] = ["http://127.0.0.1:9"]
    dead = http_fetch_batch(pdf_dead, use_proxies=True, timeout_s=1.0)
    assert list(dead["status"]) == [599]


def test_unknown_transport_raises():
    """A transport typo must raise, not silently crawl the simulator."""
    from pyspider_spark.fetch import run_fetch

    with pytest.raises(ValueError, match="unknown transport"):
        run_fetch(None, SPEC, transport="HTTP")
