"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count + sorted-column schema + order-insensitive value equality."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pyspider_spark.queries import TABLES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            df[c] = s.astype(np.float64)
        elif np.issubdtype(s.dtype, np.integer):
            df[c] = s.astype(np.int64)
        elif s.dtype == bool:
            df[c] = s.astype(bool)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count differs: {len(got)} vs {len(want)}"
    if len(got) == 0:
        return True, "ok (0 rows)"
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            b.dtype, np.floating
        ):
            eq = np.allclose(
                a.astype(np.float64), b.astype(np.float64), rtol=0, atol=0, equal_nan=True
            )
        else:
            eq = a.astype(str).equals(b.astype(str))
        if not eq:
            mism = (a.astype(str) != b.astype(str)).to_numpy().nonzero()[0][:3]
            detail = [
                (int(i), a.iloc[i], b.iloc[i]) for i in mism
            ] if len(mism) else "float mismatch"
            return False, f"column {c} differs: {detail}"
    return True, f"ok ({len(got)} rows)"
