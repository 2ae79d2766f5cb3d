"""Frontier scheduler: priority+age pop with politeness + robots + skew kill.

Pop ordering contract (north rule; classic-pyspider order — the
reference's FIFO asyncio.Queue, reference common/spider.py:45,217-243, is
the degenerate case priority=const):

    ORDER BY priority DESC, exetime ASC, url_canon ASC

applied twice: per-host (politeness budget = config.concurrency, the
reference's semaphore bound, common/spider.py:44,138) and globally
(pop_budget, the reference's ``spop count=1000`` batch,
spiders/amazon/crawl_goods_list.py:44). Rows over budget are deferred:
``exetime = round + 1`` (the reference's ``asyncio.sleep(delay)``
politeness, common/spider.py:152, re-expressed as time-shift columns).

Skew: the per-host window shuffles on host alone; one giant host would
serialize into one task. We pre-rank within (host, salt) buckets and
cap each bucket at the full budget first — the second, exact window then
runs on at most ``S x budget`` rows per host instead of the host's whole
backlog. Both windows are pure column ops (whole-stage codegen; no UDF).
AQE skew-join splitting handles the residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def pop_order():
    """The authoritative total pop order (north rule)."""
    return [F.col("priority").desc(), F.col("exetime").asc(), F.col("url_canon").asc()]


N_SALT = 16  # salt buckets per host (FIXTURES.md §1)

DEFAULT_BUDGET = 20  # reference Settings.concurrency, common/settings.py:6


def with_salt(df: DataFrame) -> DataFrame:
    """Hash-derived salt bucket — deterministic (never rand())."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("url_canon")), F.lit(N_SALT)).cast("int")
    )


def split_ready(frontier: DataFrame, round_no: int):
    """Rows due this round vs rows parked for a later round."""
    ready = frontier.filter(F.col("exetime") <= F.lit(round_no))
    not_ready = frontier.filter(F.col("exetime") > F.lit(round_no))
    return ready, not_ready


def dedup_batch(ready: DataFrame) -> DataFrame:
    """One row per url_canon within the batch: keep the best by
    (priority desc, exetime asc, retries desc, round_added asc).
    retries desc so an in-flight retry beats a fresh re-discovery of the
    same URL (the re-discovery would be seen-filtered anyway)."""
    w = Window.partitionBy("url_canon").orderBy(
        F.col("priority").desc(),
        F.col("exetime").asc(),
        F.col("retries").desc(),
        F.col("round_added").asc(),
        F.col("stage").asc(),
        F.col("url").asc(),  # total order even for canonical-equivalent dups
        F.col("lineage").asc_nulls_first(),
    )
    return (
        ready.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def robots_filter(ready: DataFrame, robots: DataFrame):
    """Drop rows matching a disallow prefix for their host. robots is a
    small dim → broadcast; prefix match via startswith. Returns
    (allowed, blocked_count_df). North-rule addition (absent in the
    reference)."""
    dis = robots.filter(~F.col("allow")).select(
        F.col("host").alias("_rhost"), F.col("path_prefix").alias("_rpfx")
    )
    path = F.regexp_replace(F.col("url_canon"), r"^[a-z]+://[^/]+", "")
    joined = ready.join(
        F.broadcast(dis),
        (F.col("host") == F.col("_rhost")) & path.startswith(F.col("_rpfx")),
        "left_outer",
    )
    allowed = joined.filter(F.col("_rhost").isNull()).drop("_rhost", "_rpfx")
    blocked = joined.filter(F.col("_rhost").isNotNull()).drop("_rhost", "_rpfx")
    return allowed, blocked


def pop(
    ready: DataFrame,
    config: DataFrame,
    round_no: int,
    global_budget: int | None = None,
):
    """Two-level budgeted pop. Returns (popped, deferred) where deferred
    rows carry exetime = round_no + 1.

    Plan: broadcast-join config → salted pre-rank (host, salt) →
    exact per-host rank → global rank. All whole-stage-codegen windows.
    """
    budgets = F.broadcast(
        config.select(
            F.col("host").alias("_bhost"), F.col("concurrency").alias("_budget")
        )
    )
    df = ready.join(budgets, F.col("host") == F.col("_bhost"), "left_outer").drop(
        "_bhost"
    )
    df = df.withColumn("_budget", F.coalesce(F.col("_budget"), F.lit(DEFAULT_BUDGET)))
    df = with_salt(df)

    # Stage 1 (skew kill): cap each (host, salt) bucket at the host budget.
    w_salt = Window.partitionBy("host", "salt").orderBy(*pop_order())
    df = df.withColumn("_srn", F.row_number().over(w_salt))
    survivors = df.filter(F.col("_srn") <= F.col("_budget"))
    salt_overflow = df.filter(F.col("_srn") > F.col("_budget"))

    # Stage 2: exact per-host rank on the capped set (≤ N_SALT x budget rows/host).
    w_host = Window.partitionBy("host").orderBy(*pop_order())
    survivors = survivors.withColumn("_hrn", F.row_number().over(w_host))
    in_budget = survivors.filter(F.col("_hrn") <= F.col("_budget"))
    host_overflow = survivors.filter(F.col("_hrn") > F.col("_budget"))

    # Stage 3: global cap (ref spop count=1000).
    if global_budget is not None:
        w_glob = Window.orderBy(*pop_order())  # single-partition window on ≤ Σ budgets rows
        in_budget = in_budget.withColumn("_grn", F.row_number().over(w_glob))
        popped = in_budget.filter(F.col("_grn") <= F.lit(global_budget))
        glob_overflow = in_budget.filter(F.col("_grn") > F.lit(global_budget))
    else:
        popped = in_budget.withColumn("_grn", F.lit(None).cast("int"))
        glob_overflow = in_budget.filter(F.lit(False)).withColumn(
            "_grn", F.lit(None).cast("int")
        )

    aux = ["_budget", "_srn", "_hrn", "_grn"]
    popped = popped.drop(*aux)
    deferred = (
        salt_overflow.withColumn("_hrn", F.lit(None).cast("int"))
        .withColumn("_grn", F.lit(None).cast("int"))
        .unionByName(host_overflow.withColumn("_grn", F.lit(None).cast("int")))
        .unionByName(glob_overflow)
        .drop(*aux)
        .withColumn("exetime", F.lit(round_no + 1).cast("long"))
    )
    return popped, deferred


def split_fetch_outcomes(results: DataFrame, captcha_marker: str):
    """Partition fetch results into ok / retryable / exhausted
    (reference retry loop common/spider.py:133-163 + captcha re-enqueue
    spiders/amazon/crawl_goods_list.py:50-52)."""
    is_fail = F.col("status") >= 500
    is_captcha = (F.col("status") == 200) & F.col("body").contains(captcha_marker)
    ok = results.filter(~is_fail & ~is_captcha)
    retryable = results.filter(
        (is_fail | is_captcha) & (F.col("retries") + 1 < F.col("max_retries"))
    )
    exhausted = results.filter(
        (is_fail | is_captcha) & (F.col("retries") + 1 >= F.col("max_retries"))
    )
    requeue = (
        retryable.withColumn("retries", (F.col("retries") + 1).cast("int"))
        .withColumn("_captcha", is_captcha)
    )
    return ok, requeue, exhausted
