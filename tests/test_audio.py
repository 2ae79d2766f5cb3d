"""Real WAV/PCM audio pipeline (VERDICT r4 item 4): lossless int16
round-trip through stdlib wave, per-row decode tolerance in the Spark
stage, and golden-fixture stability."""

from __future__ import annotations

import numpy as np
import pytest

from pyspider_spark import audio as A
from pyspider_spark.data import multimodal as M


@pytest.mark.parametrize("audio_id", ["aud0-0", "aud1-0", "aud7-0", "x"])
def test_wav_roundtrip_exact(audio_id):
    """PCM is lossless: decode(encode(x)) == x bit-for-bit, both
    sample rate and every int16 sample."""
    pcm, sr = A.synth_pcm(audio_id)
    payload = A.encode_wav(pcm, sr)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    dec, dsr = A.decode_wav(payload)
    assert dsr == sr
    assert dec.dtype == np.int16 and dec.shape == pcm.shape
    assert (dec == pcm).all()


def test_mono_1d_input_roundtrip():
    mono = np.arange(-500, 500, dtype=np.int16)
    dec, sr = A.decode_wav(A.encode_wav(mono, 8000))
    assert sr == 8000 and dec.shape == (1000, 1)
    assert (dec[:, 0] == mono).all()


def test_decode_rejects_garbage():
    with pytest.raises(Exception):
        A.decode_wav(b"not a wav file at all")


def test_features_match_exact_integers():
    pcm = np.array([[3], [-4], [0], [5]], dtype=np.int16)
    f = A.audio_features(pcm, 1000)
    assert f["n_samples"] == 4 and f["channels"] == 1
    assert f["duration_ms"] == 4
    assert f["peak"] == 5
    # rms = sqrt((9+16+0+25)/4) = sqrt(12.5) = 3.5355... -> 3535
    assert f["rms_milli"] == 3535


def test_spark_stage_matches_pure_python(spark):
    """The Arrow-batched stage must emit exactly the no-Spark feature
    integers (the same contract the golden parquet pins for the
    driver)."""
    docs = spark.createDataFrame(
        [{"doc_id": i} for i in range(12)], "doc_id bigint"
    )
    got = {
        r["audio_id"]: (
            r["sample_rate"], r["channels"], r["n_samples"],
            r["duration_ms"], r["rms_milli"], r["peak"], r["decode_ok"],
        )
        for r in M.extract_audio_features(M.synthesize_audio(docs)).collect()
    }
    for i in range(12):
        audio_id = f"aud{i}-0"
        pcm, sr = A.synth_pcm(audio_id)
        dec, dsr = A.decode_wav(A.encode_wav(pcm, sr))
        f = A.audio_features(dec, dsr)
        assert got[audio_id] == (
            f["sample_rate"], f["channels"], f["n_samples"],
            f["duration_ms"], f["rms_milli"], f["peak"], True,
        )


def test_spark_stage_tolerates_corrupt_rows(spark):
    clips = spark.createDataFrame(
        [
            {"audio_id": "ok", "bytes": A.encode_wav(*A.synth_pcm("ok")),
             "sample_rate": None, "channels": None, "n_samples": None, "caption": None},
            {"audio_id": "bad", "bytes": b"\x00\x01garbage",
             "sample_rate": None, "channels": None, "n_samples": None, "caption": None},
        ],
        M.AUDIO,
    )
    rows = {r["audio_id"]: r for r in M.extract_audio_features(clips).collect()}
    assert rows["ok"]["decode_ok"] is True
    assert rows["bad"]["decode_ok"] is False and rows["bad"]["rms_milli"] is None


def test_golden_fixture_regenerates_identically(tmp_path):
    """Re-running the generator must be a byte-stable no-op (the
    committed fixture is reproducible from source alone)."""
    import pyarrow.parquet as pq

    import tests.make_golden_audio_features as G

    committed = pq.read_table(G.OUT)
    fresh = [G.feature_row(d) for d in range(40)]
    assert committed.to_pylist() == fresh


def test_decode_audio_batch_surface():
    import pandas as pd

    pcm, sr = A.synth_pcm("batchy")
    out = M.decode_audio_batch(pd.Series([A.encode_wav(pcm, sr), b"junk"]))
    assert (out[0] == pcm).all()
    assert out[1] is None
