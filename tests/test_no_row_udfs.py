"""Static audit: no per-row Python UDFs anywhere in the engine
(BASELINE.json input_hint forbids them — only Arrow-batched pandas UDFs
/ mapInPandas / applyInPandas and native Columns are allowed)."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "pyspider_spark")

FORBIDDEN = [
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"^\s*@udf\b"),
    re.compile(r"\bfunctions\.udf\s*\("),
    re.compile(r"\bspark\.udf\.register\b"),
    re.compile(r"\.rdd\b"),  # RDD drops to row-at-a-time Python
    re.compile(r"\bmapPartitions\s*\("),
]

ALLOWED_HINTS = ("pandas_udf", "mapInPandas", "applyInPandas")


def test_no_row_at_a_time_python():
    offenders = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    for pat in FORBIDDEN:
                        if pat.search(line):
                            offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "row-at-a-time Python found:\n" + "\n".join(offenders)


def test_nondeterminism_audit():
    """No rand()/random/now()/uuid in engine dataflow code — resumes
    must be byte-identical. (tables.py uses uuid for dir names only —
    filenames are not data — and is allowlisted.)"""
    pats = [
        re.compile(r"\bF\.rand\b"),
        re.compile(r"\bmonotonically_increasing_id\b"),
        re.compile(r"\bcurrent_timestamp\b"),
        re.compile(r"(?<!`)\brandom\.(random|choice|randint|uniform|sample)\s*\("),
        re.compile(r"\btime\.time\(\)"),
    ]
    allow_files = {"tables.py"}
    offenders = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py") or fn in allow_files:
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    for pat in pats:
                        if pat.search(line):
                            offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "nondeterminism found:\n" + "\n".join(offenders)
