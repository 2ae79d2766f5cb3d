"""Write-format contract for binary-payload tables (images).

Parquet dictionary encoding on multi-hundred-KB unique binary values
hashes every value into a dictionary it then abandons — measured 3-4x
write-path overhead on the 5.4 GB images frame (tables.py A/B note).
The store must write images with dictionary encoding OFF and lz4
column chunks, while text tables keep the default (dictionary on),
which genuinely shrinks repetitive string columns.
"""

from __future__ import annotations

import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pyspider_spark.schemas import IMAGES
from pyspider_spark.tables import TableStore, parquet_file_rows


def _column_meta(dirs):
    metas = []
    for f, _ in parquet_file_rows(dirs):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                metas.append(md.row_group(rg).column(c))
    return metas


def _dirs(store, name):
    m = store._load_manifest(name)
    return store._snapshot(m, None)["dirs"]


def test_images_write_lz4_no_dictionary(spark):
    store = TableStore(spark, tempfile.mkdtemp(prefix="fmt_"))
    imgs = spark.range(64).select(
        F.format_string("i%d", "id").alias("image_id"),
        F.expr("cast(repeat('payload', 64) as binary)").alias("bytes"),
        F.lit(32).cast("int").alias("w"),
        F.lit(32).cast("int").alias("h"),
        F.lit("png").alias("fmt"),
        F.lit("cap").alias("caption"),
        F.col("id").cast("long").alias("phash"),
    )
    store.append("images", imgs.select(*[f.name for f in IMAGES.fields]))
    metas = _column_meta(_dirs(store, "images"))
    assert metas, "no parquet column chunks written"
    for cm in metas:
        assert "PLAIN_DICTIONARY" not in cm.encodings
        assert "RLE_DICTIONARY" not in cm.encodings
        # LZ4_RAW, not Hadoop-framed LZ4: the framed variant is
        # undecodable by older pyarrow/duckdb and external readers.
        # pyarrow 16.1 labels the LZ4_RAW codec "LZ4" and the
        # deprecated framed codec "UNKNOWN" — so "UNKNOWN" here means
        # the non-portable codec leaked back in.
        assert cm.compression in ("LZ4", "LZ4_RAW")
        assert cm.compression not in ("SNAPPY", "UNKNOWN")
    # portability contract: a non-Spark reader decodes the payload
    import duckdb
    import os

    files = [
        os.path.join(d, f)
        for d in _dirs(store, "images")
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]
    n = duckdb.sql(
        f"select count(*) from read_parquet({files!r})"
    ).fetchall()[0][0]
    assert n == 64


def test_text_tables_keep_dictionary(spark):
    store = TableStore(spark, tempfile.mkdtemp(prefix="fmt_"))
    txt = spark.range(5000).coalesce(1).select(
        F.pmod("id", F.lit(10)).cast("string").alias("host"),
        F.col("id").cast("string").alias("url"),
    )
    store.append("items_like", txt)
    metas = _column_meta(_dirs(store, "items_like"))
    assert any(
        "PLAIN_DICTIONARY" in cm.encodings or "RLE_DICTIONARY" in cm.encodings
        for cm in metas
    ), "default tables should still dictionary-encode repetitive strings"
