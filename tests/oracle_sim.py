"""Pure-Python oracle simulator of the crawl contract (SURVEY.md §5.2).

Implements the exact scheduling/dedup/politeness semantics the Spark
engine claims (north rule: priority desc, exetime asc, url_canon
tiebreak; per-host budget = config concurrency; retry/captcha requeue
with max_retries cap; robots prefix filter; seen-set exactly-once) as
~150 lines of in-memory Python over the same deterministic synthetic
graph (pyspider_spark.synth). The engine's per-round pop sequences,
counters, items, and final seen set must match this byte-for-byte.

Vet-at-discovery contract (mirrors the engine's incremental frontier):
links are vetted when DISCOVERED — in-batch first-parent dedup, then
the enqueued-membership check (covers seen, queued, and every earlier
discovery), then robots — and only survivors enter the frontier, so
``deduped``/``robots_blocked``/``new_links`` count at the discovery
round. Deferral never touches a row (its effective exetime is the
current round by construction), and popped rows leave the frontier;
pop order within a round is the north-rule total order with the
derived exetime, i.e. (priority desc, url_canon asc).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspider_spark import synth
from pyspider_spark.canon import canonicalize_url
from pyspider_spark.synth import CAPTCHA_MARKER, GraphSpec


@dataclass
class Row:
    url: str
    url_canon: str
    host: str
    priority: int
    exetime: int
    retries: int = 0
    max_retries: int = 3
    stage: str = "list"
    round_added: int = 0
    lineage: str | None = None


def scheduler_quantum() -> float:
    """Independent restatement of scheduler.ROUND_QUANTUM_S (60 s per
    scheduling round) — kept literal here so the oracle stays free of
    Spark imports; test_scheduler_units pins the two values equal."""
    return 60.0


def _path_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


@dataclass
class OracleEngine:
    spec: GraphSpec
    global_budget: int | None = None
    batch_sales: bool = True
    frontier: list[Row] = field(default_factory=list)
    enqueued: set[str] = field(default_factory=set)
    seen: set[str] = field(default_factory=set)
    items: list[tuple] = field(default_factory=list)
    api_items: list[tuple] = field(default_factory=list)
    sales_items: list[tuple] = field(default_factory=list)
    image_ids: set[str] = field(default_factory=set)
    pop_sequences: dict[int, list[str]] = field(default_factory=dict)
    metrics: dict[int, dict] = field(default_factory=dict)

    def _budget(self, host: str) -> int:
        b = 20
        for c in synth.config_rows(self.spec):
            if c["host"] == host:
                b = c["concurrency"]
                break
        # robots Crawl-delay caps the per-round budget (Q15): effective
        # concurrency = min(concurrency, floor(quantum / max delay)) —
        # mirrors scheduler.effective_config bit-for-bit.
        # delay <= 0 is "no delay" in both engine and oracle (ADVICE r4:
        # 0.0 raised ZeroDivisionError here while the engine left the
        # budget uncapped — a degenerate-input divergence)
        delays = [
            r["crawl_delay_s"]
            for r in synth.robots_rows(self.spec)
            if r["host"] == host
            and r["crawl_delay_s"] is not None
            and r["crawl_delay_s"] > 0
        ]
        if delays:
            b = min(b, int(scheduler_quantum() // max(delays)))
        return b

    def _disallowed(self, host: str, path: str) -> bool:
        for r in synth.robots_rows(self.spec):
            if r["host"] == host and not r["allow"] and path.startswith(r["path_prefix"]):
                return True
        return False

    def bootstrap(self) -> None:
        for raw in synth.seed_urls(self.spec):
            uc = canonicalize_url(raw)
            if uc in self.enqueued:
                continue
            host = uc.split("://", 1)[-1].split("/", 1)[0]
            if self._disallowed(host, _path_of(uc)):
                continue
            self.enqueued.add(uc)
            self.frontier.append(
                Row(
                    url=raw,
                    url_canon=uc,
                    host=host,
                    priority=synth.priority_of(uc),
                    exetime=synth.seed_exetime(uc),
                    stage=synth.stage_of(uc),
                    lineage="seed",
                )
            )

    def ingest(self, raw_urls: list[str], next_round: int) -> int:
        """Mid-crawl out-of-band seed ingestion (engine ingest_urls /
        the S10 Kafka-source path): vet exactly like discovered links —
        canonicalize → in-batch dedup → enqueued membership → robots —
        and append survivors due at ``next_round``. Returns rows added."""
        r = next_round - 1
        new_best: dict[str, Row] = {}
        for url in sorted(raw_urls, key=canonicalize_url):
            uc = canonicalize_url(url)
            if uc in new_best:
                continue
            host = uc.split("://", 1)[-1].split("/", 1)[0]
            new_best[uc] = Row(
                url=url, url_canon=uc, host=host,
                priority=synth.priority_of(uc), exetime=r + 1,
                stage=synth.stage_of(uc), round_added=r, lineage=None,
            )
        added = 0
        for uc, row in new_best.items():
            if uc in self.enqueued:
                continue
            if self._disallowed(row.host, _path_of(uc)):
                continue
            self.enqueued.add(uc)
            self.frontier.append(row)
            added += 1
        return added

    def run_round(self, r: int) -> dict:
        m = dict(
            round=r, popped=0, fetched_ok=0, failed=0, retried=0,
            captcha_requeued=0, deduped=0, deferred_politeness=0,
            robots_blocked=0, new_links=0, items_emitted=0, images_landed=0,
        )
        ready = [x for x in self.frontier if x.exetime <= r]
        parked = [x for x in self.frontier if x.exetime > r]

        # rows are pre-vetted at discovery; no per-round dedup/seen/
        # robots. Effective exetime == r for every ready row, so the
        # north-rule order reduces to (priority desc, url_canon asc).
        # per-host budget then global cap
        order = lambda x: (-x.priority, x.url_canon)
        by_host: dict[str, list[Row]] = {}
        for x in ready:
            by_host.setdefault(x.host, []).append(x)
        selected, deferred = [], []
        for host, rows in by_host.items():
            rows.sort(key=order)
            b = self._budget(host)
            selected += rows[:b]
            deferred += rows[b:]
        selected.sort(key=order)
        if self.global_budget is not None:
            deferred += selected[self.global_budget :]
            selected = selected[: self.global_budget]
        # deferral writes nothing: deferred rows keep their entry
        # exetime and re-enter next round (effective exetime == round)
        m["deferred_politeness"] = len(deferred)
        m["popped"] = len(selected)
        self.pop_sequences[r] = [x.url_canon for x in selected]

        # fetch + outcomes
        requeues, new_rows_raw = [], []
        sales_new: dict[str, set[str]] = {}
        for x in selected:
            if x.retries == 0:
                self.seen.add(x.url_canon)
            res = synth.fetch_sim(self.spec, x.url_canon)
            captcha = res["status"] == 200 and CAPTCHA_MARKER in (res["body"] or "")
            if res["status"] >= 500 or captcha:
                if x.retries + 1 < x.max_retries:
                    x.retries += 1
                    x.exetime = r + 1
                    x.round_added = r
                    x.lineage = "retry"
                    x.url = x.url_canon
                    requeues.append(x)
                    if captcha:
                        m["captcha_requeued"] += 1
                    else:
                        m["retried"] += 1
                else:
                    m["failed"] += 1
                continue
            m["fetched_ok"] += 1
            self._parse(x, res, r, m, new_rows_raw, sales_new)

        # Q12: this round's discovered skus roll up into batch sales
        # requests — sorted per host, fixed-size chunks (mirrors
        # stages.sales_chunk_links; ref jingxi_category_sales.py:112-118)
        if self.batch_sales:
            cs = self.spec.sales_chunk_size
            for host in sorted(sales_new):
                ids = sorted(sales_new[host])
                parent = synth.sales_parent(host)
                for i in range(0, len(ids), cs):
                    new_rows_raw.append(
                        (parent, synth.sales_url(host, ids[i : i + cs]))
                    )

        # vet-at-discovery: first-parent in-batch dedup, then enqueued
        # membership, then robots; only survivors enter the frontier.
        new_best: dict[str, Row] = {}
        for parent, url in sorted(new_rows_raw, key=lambda t: (canonicalize_url(t[1]), t[0])):
            uc = canonicalize_url(url)
            if uc in new_best:
                continue
            host = uc.split("://", 1)[-1].split("/", 1)[0]
            new_best[uc] = Row(
                url=url, url_canon=uc, host=host,
                priority=synth.priority_of(uc), exetime=r + 1,
                stage=synth.stage_of(uc), round_added=r, lineage=parent,
            )
        m["deduped"] += len(new_rows_raw) - len(new_best)
        appended = []
        for uc, row in new_best.items():
            if uc in self.enqueued:
                m["deduped"] += 1
            elif self._disallowed(row.host, _path_of(uc)):
                m["robots_blocked"] += 1
            else:
                self.enqueued.add(uc)
                appended.append(row)
        m["new_links"] = len(appended)

        self.frontier = parked + deferred + requeues + appended
        self.metrics[r] = m
        return m

    def _parse(
        self, x: Row, res: dict, r: int, m: dict, new_rows: list,
        sales_new: dict[str, set[str]] | None = None,
    ) -> None:
        spec = self.spec
        u = synth.parse_synth_url(x.url_canon)
        if x.stage == "list":
            for link in res["out_links"]:
                new_rows.append((x.url_canon, link))
            for ref in res["image_refs"]:
                new_rows.append((x.url_canon, synth.img_url(spec, u["h"], ref)))
        elif x.stage == "api":
            body = res["body"]
            inner = body[len(synth.JSONP_PREFIX) : -len(synth.JSONP_SUFFIX)]
            import json

            js = json.loads(inner)
            data = js.get("result", {}).get("data", {})
            items = data.get("items") or []
            for it in items:
                self.api_items.append(
                    (it["sku"], it["tuancount"], it["salecount"],
                     data["cat"], data["page"], x.host, r)
                )
                if self.batch_sales and sales_new is not None:
                    sales_new.setdefault(x.host, set()).add(it["sku"])
            m["items_emitted"] += len(items)
            if items:
                new_rows.append(
                    (x.url_canon, synth.api_url(spec, u["h"], data["cat"], data["page"] + 1))
                )
        elif x.stage == "detail":
            it = res["item"]
            nn = lambda v: v if v is not None else ""
            self.items.append(
                (
                    it["asin_id"], it["img_url"], it["goods_name"],
                    nn(it["star_rating"]), nn(it["price"]),
                    it["goods_detail_link"], it["goods_comment_num"],
                    it["goods_comment_link"], x.url_canon, r,
                )
            )
            m["items_emitted"] += 1
        elif x.stage == "sales":
            import json

            js = json.loads(res["body"])
            for it in js.get("sales") or []:
                self.sales_items.append(
                    (it["sku"], it["stock"], it["sale_price_cents"], x.host, r)
                )
                m["items_emitted"] += 1
        elif x.stage == "img":
            for ref in res["image_refs"]:
                self.image_ids.add(ref)
            m["images_landed"] += len(res["image_refs"])

    def run(self, max_rounds: int = 10) -> None:
        self.bootstrap()
        for r in range(max_rounds):
            self.run_round(r)
            if not self.frontier:
                break
