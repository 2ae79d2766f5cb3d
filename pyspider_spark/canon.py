"""URL canonicalization — Arrow-vectorized (operator P17 in SURVEY.md §2.2).

The reference dedups on exact URL strings (in-memory sets + Redis SADD,
reference spiders/jingxi/jingxi_category_sales.py:17,101); the north rule
requires real canonicalization: scheme/host lowercased, query params
sorted, fragment stripped. Implemented as a pandas UDF (Arrow batches;
the python-level loop is over one Arrow batch, never row-at-a-time
through the serializer), plus a pure-Python single-URL function shared
with the oracle.

Host extraction stays JVM-side via ``parse_url`` — no Python involved.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, drop default port, drop
    fragment, sort query params by (key, value), normalize empty path
    to '/'."""
    try:
        s = urlsplit(url.strip())
        # s.port PARSES lazily and raises on out-of-range/garbage ports
        # ("http://h:99999/") — it must stay inside this guard or one
        # hostile link kills the whole Arrow batch's task
        host = s.hostname.lower() if s.hostname else ""
        port = s.port
    except ValueError:
        return url.strip()
    scheme = s.scheme.lower()
    if ":" in host:  # IPv6 literal: urlsplit strips the brackets
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


def with_canonical(df, url_col: str = "url"):
    """Add url_canon + host columns. host = lower(parse_url(url_canon,
    'HOST')) — JVM expression, codegen'd."""
    out = df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
    return out.withColumn("host", host_of(F.col("url_canon")))


def host_of(url_canon: Column) -> Column:
    return F.lower(F.parse_url(url_canon, F.lit("HOST")))
