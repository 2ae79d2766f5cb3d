"""Every oracled query in the registry must match DuckDB bit-for-bit —
the local replica of the driver's CORRECTNESS gate (run at sf0.001 to
keep the suite fast; the driver runs the same pairs at sf0.01)."""

from __future__ import annotations

import os

import pytest

from pyspider_spark import queries as Q

from .parity import compare, duck_run

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLED = [name for name, q in Q.REGISTRY.items() if q.sql is not None]
ROWS_ONLY = [
    name
    for name, q in Q.REGISTRY.items()
    if q.sql is None and name != "crawl_roundloop"  # crawl covered by e2e tests
]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    q = Q.REGISTRY[name]
    ok, msg = compare(q.fn(spark, SF), duck_run(q.sql, SF))
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = Q.REGISTRY[name].fn(spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
