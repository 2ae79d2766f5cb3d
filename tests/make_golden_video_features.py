#!/usr/bin/env python
"""Generate tests/golden/m_video_features.parquet — the committed
oracle fixture for the ``m_video_pipeline`` driver query.

Pure-Python replay (NO Spark) of the video feature pipeline for
doc_id 0..39: frame synthesis → AVI encode → AVI decode →
frame-sample → typed integer features, using the same
pyspider_spark.video primitives the Arrow-batched Spark stage wraps.
Same contract as the image/audio golden generators: re-running this
script must be a no-op diff.

Run from the repo root: python tests/make_golden_video_features.py
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspider_spark import video as V  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "m_video_features.parquet")
EVERY_N = 2


def feature_row(doc_id: int) -> dict:
    # mirrors data/multimodal.synthesize_video (j=0) + extract_video_features
    video_id = f"vid{doc_id}-0"
    frames = V.synth_frames(video_id)
    payload = V.encode_avi_rgb24(frames, V.FPS)
    decoded, fps = V.decode_avi_rgb24(payload)
    f = V.video_features(decoded, fps, EVERY_N)
    return {"video_id": video_id, **f, "n_bytes": len(payload), "decode_ok": True}


def main() -> None:
    rows = [feature_row(d) for d in range(40)]
    schema = pa.schema(
        [
            ("video_id", pa.string()),
            ("n_frames", pa.int32()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fps", pa.int32()),
            ("duration_ms", pa.int64()),
            ("n_sampled", pa.int32()),
            ("sampled_luma_milli", pa.int64()),
            ("n_bytes", pa.int64()),
            ("decode_ok", pa.bool_()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
