"""phash near-duplicate detection for the image payload (SURVEY §2.5 J5;
north star: "phash-based near-duplicate detection as a broadcast bloom
pre-filter").

Design (banded LSH over the 64-bit perceptual hash):

- the phash splits into 8 bands of 8 bits. Two images within hamming
  distance ≤ 7 MUST agree exactly on at least one band (pigeonhole), so
  banded equality is a lossless candidate filter for that radius.
- a bloom filter over all previously-seen ``(band_id, band_value)``
  keys is tiny (8 keys/image → even 10^10 images fit a few GiB at 1%
  FPR; per-partition blobs like seen.py at that scale — broadcast at
  ours) and prunes brand-new images before any join: an image whose 8
  band keys all miss the bloom has NO near-dup among seen images.
- surviving candidates join the images table on the band key; the exact
  ``bit_count(xor)`` hamming check keeps true pairs.

The crawl loop appends pairs to a ``near_dup_images`` table each round
(non-destructive: the images table keeps every row; dedup policy is a
downstream choice).

Scale notes: the band join shuffles only candidate band keys (8
rows/image), never pixels; AQE splits hot bands (boilerplate images).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .seen import bloom_build, bloom_maybe_contains

N_BANDS = 8
BAND_BITS = 8
MAX_HAMMING = N_BANDS - 1  # banded equality is lossless up to here

NEAR_DUP_IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dup_of", T.StringType(), False),
        T.StructField("hamming", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

PHASH_BLOOM_BITS = 1 << 20


def band_keys(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    """Explode each image row into its 8 (band_key, ...) rows."""
    keys = F.array(
        *[
            F.format_string(
                f"{b}:%d", F.expr(f"({phash_col} >> {BAND_BITS * b}) & 255")
            )
            for b in range(N_BANDS)
        ]
    )
    return df.withColumn("band_key", F.explode(keys))


def build_band_bloom(images: DataFrame, n_bits: int = PHASH_BLOOM_BITS) -> bytes:
    """Bloom blob over every band key of the given images (driver-side
    result, broadcast by value to the pre-filter)."""
    keys = band_keys(images.select("phash")).select("band_key")

    def build(pdf_iter):
        for pdf in pdf_iter:
            yield pd.DataFrame({"blob": [bloom_build(pdf["band_key"], n_bits)]})

    blobs = keys.mapInPandas(
        build, schema=T.StructType([T.StructField("blob", T.BinaryType())])
    ).collect()
    if not blobs:
        return b"\x00" * (n_bits // 8)
    import numpy as np

    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in blobs:
        acc |= np.frombuffer(r.blob, dtype=np.uint8)
    return acc.tobytes()


def bloom_prefilter(new_images: DataFrame, blob: bytes, n_bits: int = PHASH_BLOOM_BITS) -> DataFrame:
    """Keep only new images with ≥1 band-key bloom hit (possible
    near-dup among seen). Arrow-batched; ships only (image_id, phash)."""
    slim = band_keys(new_images.select("image_id", "phash"))

    def flag(pdf_iter):
        for pdf in pdf_iter:
            hit = bloom_maybe_contains(pdf["band_key"], blob, n_bits)
            yield pdf[hit][["image_id"]]

    hits = slim.mapInPandas(
        flag, schema=T.StructType([T.StructField("image_id", T.StringType())])
    ).dropDuplicates(["image_id"])
    return new_images.join(hits, on="image_id", how="left_semi")


def near_dup_pairs(
    new_images: DataFrame,
    corpus: DataFrame,
    round_no: int,
    max_hamming: int = MAX_HAMMING,
    cross: bool = False,
) -> DataFrame:
    """(image_id, dup_of, hamming) for every new image within
    ``max_hamming`` of a corpus image. ``cross=False`` = self-join
    semantics (id > id avoids self/mirror pairs); ``cross=True`` = the
    two sides are different sets, keep all non-identical pairs."""
    a = band_keys(new_images.select("image_id", "phash")).select(
        "band_key", F.col("image_id").alias("image_id"), F.col("phash").alias("ph_a")
    )
    b = band_keys(corpus.select("image_id", "phash")).select(
        "band_key", F.col("image_id").alias("dup_of"), F.col("phash").alias("ph_b")
    )
    pair_filter = (
        (F.col("image_id") != F.col("dup_of"))
        if cross
        else (F.col("image_id") > F.col("dup_of"))
    )
    return (
        a.join(b, on="band_key")
        .filter(pair_filter)
        .select(
            "image_id",
            "dup_of",
            F.expr("cast(bit_count(ph_a ^ ph_b) as int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["image_id", "dup_of"])
        .withColumn("round", F.lit(round_no).cast("int"))
    )
