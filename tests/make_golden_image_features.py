#!/usr/bin/env python
"""Generate tests/golden/m_image_features.parquet — the committed
oracle fixture for the ``m_image_pipeline`` driver query.

Pure-Python replay (NO Spark) of the multimodal feature pipeline for
doc_id 0..39: image synthesis → encode → decode → typed features,
using the same imaging primitives the Arrow-batched Spark stage wraps.
What the fixture therefore pins is the SPARK PLUMBING — mapInPandas
batch shape, schema, per-row tolerance — producing exactly these
per-row integers, plus regression over time (the fixture is generated
once and committed; re-running this script must be a no-op diff).

Run from the repo root: python tests/make_golden_image_features.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspider_spark import imaging  # noqa: E402
from pyspider_spark.hashing import h64  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "m_image_features.parquet")


def feature_row(doc_id: int) -> dict:
    # mirrors data/multimodal.synthesize_images (j=0) + extract_features
    image_id = f"doc{doc_id}-0"
    w = (32, 64)[h64("mw", image_id) % 2]
    h = (32, 64)[h64("mh", image_id) % 2]
    fmt = "jpeg" if h64("mf", image_id) % 2 else "png"
    rgb = imaging.synth_image(image_id, w, h)
    payload = imaging.encode(rgb, fmt)
    decoded = imaging.decode(payload, fmt)
    luma = decoded.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return {
        "image_id": image_id,
        "w": int(decoded.shape[1]),
        "h": int(decoded.shape[0]),
        "fmt": fmt,
        "mean_luma_milli": int(np.floor(luma.mean() * 1000)),
        "phash": imaging.phash64(decoded),
        "decode_ok": True,
    }


def main() -> None:
    rows = [feature_row(d) for d in range(40)]
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("mean_luma_milli", pa.int64()),
            ("phash", pa.int64()),
            ("decode_ok", pa.bool_()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
