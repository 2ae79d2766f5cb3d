"""Parse stages — declarative column pipelines per stage (SURVEY.md §2.2/§2.7).

The reference dispatches responses to per-spider callback functions
(reference common/spider.py:107-115,165-186). Here each stage is a
DataFrame→DataFrame function over the fetched batch, dispatched by the
``stage`` column — a deterministic dispatch table, no per-row function
pointers. Every extraction below is a native Column expression
(regexp/from_json/substring — whole-stage codegen); no Python runs in
any parse stage.

Operator map (reference file:line → here):
- P1 JSONP unwrap (jingxi_category_gather.py:34-36)       → ``substring``
- P2 backslash repair (jingxi_goods_analysis.py:101-102)  → ``regexp_replace``
- P4 JSON path (find_goods.py:72)                         → ``from_json`` + getField
- P5 HTML select (crawl_goods_list.py:53-96)              → ``regexp_extract_all``
  (the synthetic corpus is regular; real HTML would swap in an
  Arrow-batched pandas UDF here, the one unavoidable Python spot)
- P6 projection + '' defaults (crawl_goods_list.py:57-91) → select + coalesce
- P12 URL templating from counters (example.py:57-59)     → format_string (Q10)
- Q9 fan-out (spider.py:165-186)                          → explode
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .synth import JSONP_PREFIX, JSONP_SUFFIX

API_BODY_SCHEMA = T.StructType(
    [
        T.StructField(
            "result",
            T.StructType(
                [
                    T.StructField(
                        "data",
                        T.StructType(
                            [
                                T.StructField("cat", T.IntegerType()),
                                T.StructField("page", T.IntegerType()),
                                T.StructField(
                                    "items",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("sku", T.StringType()),
                                                T.StructField("tuancount", T.LongType()),
                                                T.StructField("salecount", T.LongType()),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField("errorMsg", T.StringType()),
    ]
)

SALES_BODY_SCHEMA = T.StructType(
    [
        T.StructField(
            "sales",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sku", T.StringType()),
                        T.StructField("stock", T.LongType()),
                        T.StructField("sale_price_cents", T.LongType()),
                    ]
                )
            ),
        )
    ]
)

_LINK_RE = r'<a href="([^"]+)"'
_IMG_RE = r'<img src="([^"]+)"'


def jsonp_unwrap(body):
    """P1: fixed-width wrapper strip, then parse (``data[len(prefix):-2]``).
    Operates on the PASSED column (substr with Column args), so it
    composes — e.g. over a repaired or differently-named body column."""
    return body.substr(
        F.lit(len(JSONP_PREFIX) + 1),
        F.length(body) - F.lit(len(JSONP_PREFIX) + len(JSONP_SUFFIX)),
    )


def repair_backslashes(col):
    """P2: the reference's lone-backslash repair before JSON parse."""
    return F.regexp_replace(col, r'\\(?![/u"\\])', r"\\\\")


def _parent_meta():
    """meta for a discovered link: parent context the reference threads
    through Request(meta=...) (common/example.py:43)."""
    return F.create_map(F.lit("parent"), F.col("url_canon"))


def links_from_list(ok: DataFrame) -> DataFrame:
    """list-stage: harvest <a href> + <img src> targets → one url per row."""
    lst = ok.filter(F.col("stage") == "list")
    hrefs = F.regexp_extract_all(F.col("body"), F.lit(_LINK_RE), 1)
    imgs = F.regexp_extract_all(F.col("body"), F.lit(_IMG_RE), 1)
    return lst.select(
        F.col("url_canon").alias("parent"),
        F.explode(F.concat(hrefs, imgs)).alias("url"),
        _parent_meta().alias("meta"),
    )


def links_from_api(parsed_api: DataFrame) -> DataFrame:
    """api-stage pagination (Q10/P12): next page only while items flow,
    URL rebuilt from counters like the reference's f-string templating."""
    nxt = parsed_api.filter(F.size("items") > 0).select(
        F.col("url_canon").alias("parent"),
        F.format_string(
            "https://%s/api/items?cat=%d&page=%d",
            F.col("host"),
            F.col("cat"),
            F.col("page") + F.lit(1),
        ).alias("url"),
        # page counters travel in meta (Q10/P12 ≙ common/example.py:57-59):
        # the next api fetch reads its context from here, body parse is
        # the fallback
        F.create_map(
            F.lit("parent"), F.col("url_canon"),
            F.lit("cat"), F.col("cat").cast("string"),
            F.lit("page"), (F.col("page") + F.lit(1)).cast("string"),
        ).alias("meta"),
    )
    return nxt


def parse_api(ok: DataFrame) -> DataFrame:
    """api-stage: JSONP unwrap → backslash repair → from_json → fields."""
    api = ok.filter(F.col("stage") == "api")
    parsed = api.withColumn(
        "_js", F.from_json(repair_backslashes(jsonp_unwrap(F.col("body"))), API_BODY_SCHEMA)
    )
    # parent context from meta is authoritative when present (the
    # reference reads response.meta counters); the body echo is the
    # fallback for context-free entry pages. Identical values on the
    # synthetic corpus — gated byte-identical by the e2e oracle.
    return parsed.select(
        "url_canon",
        "host",
        F.coalesce(
            F.element_at(F.col("meta"), "cat").cast("int"),
            F.col("_js.result.data.cat"),
        ).alias("cat"),
        F.coalesce(
            F.element_at(F.col("meta"), "page").cast("int"),
            F.col("_js.result.data.page"),
        ).alias("page"),
        F.coalesce(F.col("_js.result.data.items"), F.array()).alias("items"),
    )


def api_items(parsed_api: DataFrame, round_no: int) -> DataFrame:
    it = parsed_api.select(
        "host", "cat", "page", F.explode("items").alias("it")
    )
    return it.select(
        F.col("it.sku").alias("sku"),
        F.col("it.tuancount").alias("tuancount"),
        F.col("it.salecount").alias("salecount"),
        F.col("cat").cast("int").alias("cat"),
        F.col("page").cast("int").alias("page"),
        "host",
        F.lit(round_no).cast("int").alias("round"),
    )


def sales_chunk_links(api_items_df: DataFrame, chunk_size: int) -> DataFrame:
    """Q12, engine level: merge this round's discovered skus into batch
    sales requests — ONE frontier URL per ``chunk_size`` ids (reference
    jingxi_category_sales.py:112-118 pipes 50 ids into a single HTTP
    call). Deterministic: skus sorted per host, fixed-size slices in
    order, so a resumed round rebuilds identical chunk URLs.

    Scale: the per-host window ranks only THIS round's discoveries
    (O(new skus), never the corpus); the groupBy key (host, chunk) is
    finer than host, so the merge itself parallelizes. A host that
    discovers 10^8 skus in one round would bottleneck the single-task
    rank — at that rate, pre-salt the window key by a sku prefix and
    chunk within salt groups (chunk membership changes, semantics
    don't: the reference never specifies WHICH ids share a request)."""
    from pyspark.sql import Window

    from .synth import SALES_ID_SEP

    sk = api_items_df.select("host", "sku").distinct()
    w = Window.partitionBy("host").orderBy("sku")
    chunks = (
        sk.withColumn(
            "_chunk", ((F.row_number().over(w) - 1) / chunk_size).cast("int")
        )
        .groupBy("host", "_chunk")
        .agg(F.sort_array(F.collect_list("sku")).alias("_ids"))
    )
    parent = F.concat(F.lit("https://"), F.col("host"), F.lit("/api/sales"))
    return chunks.select(
        parent.alias("parent"),
        F.concat(parent, F.lit("?ids="), F.array_join("_ids", SALES_ID_SEP)).alias(
            "url"
        ),
        F.create_map(F.lit("parent"), parent).alias("meta"),
    )


def sales_items(ok: DataFrame, round_no: int) -> DataFrame:
    """sales-stage parse: explode the batch response back to one row per
    sku (the inverse of :func:`sales_chunk_links`)."""
    sal = ok.filter(F.col("stage") == "sales")
    parsed = sal.withColumn("_js", F.from_json("body", SALES_BODY_SCHEMA))
    return parsed.select("host", F.explode("_js.sales").alias("it")).select(
        F.col("it.sku").alias("sku"),
        F.col("it.stock").alias("stock"),
        F.col("it.sale_price_cents").alias("sale_price_cents"),
        "host",
        F.lit(round_no).cast("int").alias("round"),
    )


def links_from_list_html(ok: DataFrame) -> DataFrame:
    """P5, real-parser variant of :func:`links_from_list`: the SAME
    (parent, url) output via an Arrow-batched stdlib-HTML-parser UDF —
    the swap point for arbitrary/messy pages (reference
    common/response.py:48-53 + crawl_cate_link.py:50-87). On the
    regular synthetic corpus it is byte-identical to the regex path
    (tests/test_htmlparse.py gates that)."""
    import pandas as pd

    from .htmlparse import links_batch

    lst = ok.filter(F.col("stage") == "list").select(
        F.col("url_canon").alias("parent"), "body"
    )

    def run(batches):
        for pdf in batches:
            # parent IS the page url: relative hrefs resolve against it
            links = links_batch(pdf["body"], bases=pdf["parent"])
            out = pd.DataFrame(
                {"parent": pdf["parent"], "url": links}
            ).explode("url").dropna(subset=["url"])
            out["meta"] = [{"parent": p} for p in out["parent"]]
            yield out

    schema = T.StructType(
        [
            T.StructField("parent", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    return lst.mapInPandas(run, schema=schema)


# detail-page field spec: (output column, tag, attrs, what). The
# synthetic corpus marks fields with span ids; a real deployment swaps
# this spec for class-based selectors (e.g. ("price", "span",
# {"class": "a-offscreen"}, "text") per crawl_goods_list.py:66-68).
DETAIL_FIELD_SPEC = [
    ("asin_id", "span", {"id": "asin"}, "text"),
    ("img_url", "span", {"id": "img"}, "text"),
    ("goods_name", "span", {"id": "name"}, "text"),
    ("star_rating", "span", {"id": "star"}, "text"),
    ("price", "span", {"id": "price"}, "text"),
    ("goods_detail_link", "span", {"id": "dlink"}, "text"),
    ("goods_comment_num", "span", {"id": "cnum"}, "text"),
    ("goods_comment_link", "span", {"id": "clink"}, "text"),
]


def detail_items_html(ok: DataFrame, round_no: int, spec=None) -> DataFrame:
    """P5/P6, real-parser variant of :func:`detail_items`: same item
    schema, fields extracted by selector spec with '' defaults through
    the batched HTML parser."""
    import pandas as pd

    from .htmlparse import fields_batch

    spec = spec or DETAIL_FIELD_SPEC
    det = ok.filter(F.col("stage") == "detail").select(
        F.col("url_canon").alias("src_url_canon"), "body"
    )
    names = [name for name, *_ in spec]

    def run(batches):
        for pdf in batches:
            fields = fields_batch(pdf["body"], spec)
            fields["src_url_canon"] = pdf["src_url_canon"].values
            fields["round"] = round_no
            yield fields[names + ["src_url_canon", "round"]]

    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
        + [
            T.StructField("src_url_canon", T.StringType()),
            T.StructField("round", T.IntegerType()),
        ]
    )
    return det.mapInPandas(run, schema=schema)


def _span(body, span_id: str):
    return F.regexp_extract(body, f'<span id="{span_id}">([^<]*)</span>', 1)


def detail_items(ok: DataFrame, round_no: int) -> DataFrame:
    """detail-stage: item projection with '' defaults (P6). Missing fields
    surface as '' exactly like the reference's per-field try/except."""
    det = ok.filter(F.col("stage") == "detail")
    b = F.col("body")
    return det.select(
        _span(b, "asin").alias("asin_id"),
        _span(b, "img").alias("img_url"),
        _span(b, "name").alias("goods_name"),
        _span(b, "star").alias("star_rating"),
        _span(b, "price").alias("price"),
        _span(b, "dlink").alias("goods_detail_link"),
        _span(b, "cnum").alias("goods_comment_num"),
        _span(b, "clink").alias("goods_comment_link"),
        F.col("url_canon").alias("src_url_canon"),
        F.lit(round_no).cast("int").alias("round"),
    )
