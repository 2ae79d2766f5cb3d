"""Fetcher: Arrow-batched synthetic HTTP (operator S4 in SURVEY.md §2.1).

Replaces the reference's aiohttp fetch (reference common/request.py:58-92)
with the deterministic graph oracle (:mod:`pyspider_spark.synth`) applied
via ``mapInPandas`` — one Python process per partition, Arrow batches in
and out, zero per-row serialization. The real-network swap point is
``_fetch_batch``: replace the ``fetch_sim`` call with an async HTTP pool
over the batch and everything else (retry, politeness, parse) is
unchanged.

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


def run_fetch(popped: DataFrame, spec: synth.GraphSpec) -> DataFrame:
    """popped frontier rows -> FETCH_RESULTS rows."""
    cols = _FETCH_COLS + [c for c in _PARAM_COLS if c in popped.columns]

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fetch_batch(pdf, spec)

    return popped.select(*cols).mapInPandas(fetch_partition, schema=FETCH_RESULTS)


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
