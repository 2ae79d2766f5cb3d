#!/usr/bin/env python
"""Generate tests/golden/m_audio_features.parquet — the committed
oracle fixture for the ``m_audio_pipeline`` driver query.

Pure-Python replay (NO Spark) of the audio feature pipeline for
doc_id 0..39: PCM synthesis → WAV encode → WAV decode → typed integer
features, using the same pyspider_spark.audio primitives the
Arrow-batched Spark stage wraps. Same contract as
make_golden_image_features.py: the fixture pins the SPARK PLUMBING
(mapInPandas batch shape, schema, per-row tolerance) producing exactly
these integers, and re-running this script must be a no-op diff.

Run from the repo root: python tests/make_golden_audio_features.py
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspider_spark import audio as A  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "m_audio_features.parquet")


def feature_row(doc_id: int) -> dict:
    # mirrors data/multimodal.synthesize_audio (j=0) + extract_audio_features
    audio_id = f"aud{doc_id}-0"
    pcm, sr = A.synth_pcm(audio_id)
    payload = A.encode_wav(pcm, sr)
    decoded, dsr = A.decode_wav(payload)
    f = A.audio_features(decoded, dsr)
    return {"audio_id": audio_id, **f, "n_bytes": len(payload), "decode_ok": True}


def main() -> None:
    rows = [feature_row(d) for d in range(40)]
    schema = pa.schema(
        [
            ("audio_id", pa.string()),
            ("sample_rate", pa.int32()),
            ("channels", pa.int32()),
            ("n_samples", pa.int32()),
            ("duration_ms", pa.int64()),
            ("rms_milli", pa.int64()),
            ("peak", pa.int64()),
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
