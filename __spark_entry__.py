"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the registry in
``pyspider_spark.queries`` — one entry per SQL-expressible operator
from SURVEY.md §2 plus the training-data operators (dedup, similarity,
text analysis, multimodal plumbing). Non-SQL-expressible operators
(the crawl round loop, the binary-image pipeline, float-accumulation
similarity variants) have no oracle entry → rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspider_spark import queries as _Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier pop operator (north rule's priority+age
    scheduling order with per-host budget) shaped onto sf0.001 orders."""
    return _Q.REGISTRY["q2_priority_pop"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
