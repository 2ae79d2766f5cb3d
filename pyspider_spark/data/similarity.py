"""Similarity search over the ``embeddings`` table (array<float> column).

Three tiers:

1. ``quantized_dot_topk`` — brute-force top-k with embeddings quantized
   to integer milli-units. Integer dot products are associative, so the
   result is bit-identical regardless of summation order → this is the
   DuckDB-oracle-gated variant.
2. ``cosine_topk`` — true float cosine brute force (Spark-native
   zip_with/aggregate fold; no Python). Float accumulation order makes
   cross-engine hashing unreliable, so this one is rows-only checked.
3. ``ann_lsh_topk`` — the scale path: random-hyperplane LSH signatures
   (hash-derived planes, deterministic) bucket the vectors; search only
   within matching buckets. Turns the O(Q x N) scan into O(Q x bucket).

Scale notes (100 TB / 10^9 vectors): brute force is one broadcast of
the query set against a partitioned scan (no shuffle of the big side);
LSH adds one shuffle on the signature. Skewed buckets (dense
regions) split via AQE. Per-bucket top-k uses window row_number, which
map-side-partial-aggregates poorly — so we pre-limit per partition with
a local sort inside the window's own shuffle (Spark does this
automatically for rank-limit patterns via TakeOrderedAndProject when
the k filter is pushed; verified in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000  # milli-unit quantization for the exact integer variant
N_PLANES = 8  # LSH signature bits (256 buckets; raise with corpus size)


def _quantize(col_sql: str) -> str:
    """array<float> → array<bigint>: floor(x*1000). floor of a float
    widened to double is engine-independent."""
    return f"transform({col_sql}, x -> cast(floor(x * {QUANT}) as bigint))"


def quantized_dot_topk(
    emb: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """Exact integer-dot top-k: queries = vec_id < n_queries vs all
    vectors (self excluded). Returns (qid, rank, vid, dot)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.expr(_quantize("embedding")).alias("qv")
    )
    a = emb.select(
        F.col("vec_id").alias("vid"), F.expr(_quantize("embedding")).alias("av")
    )
    dot = "aggregate(zip_with(qv, av, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
    pairs = (
        a.join(F.broadcast(q))  # broadcast the small query side; big side never shuffles
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", F.expr(dot).alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "dot")
    )


def cosine_sim_expr(a_sql: str, b_sql: str) -> str:
    """Float cosine via zip_with + aggregate folds (JVM codegen)."""
    dot = f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> cast(x as double) * y), 0d, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a_sql}, 0d, (acc, v) -> acc + cast(v as double) * v))"
    nb = f"sqrt(aggregate({b_sql}, 0d, (acc, v) -> acc + cast(v as double) * v))"
    return f"{dot} / (greatest({na} * {nb}, 1e-12))"


def cosine_topk(emb: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Brute-force float cosine top-k (rows-only oracle check)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    a = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("av"))
    pairs = (
        a.join(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", F.expr(cosine_sim_expr("qv", "av")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", F.expr("cast(floor(cos * 10000) as bigint)").alias("cos_bp"))
    )


def _plane_component_sql(p: int, i_sql: str) -> str:
    """Deterministic ±1 hyperplane component from the portable hash."""
    h = f"cast(conv(substr(md5(concat('plane:{p}:', cast({i_sql} as string))), 1, 8), 16, 10) as bigint)"
    return f"(case when {h} % 2 = 0 then 1 else -1 end)"


def lsh_signature_expr(vec_sql: str) -> str:
    """N_PLANES-bit random-hyperplane signature: bit p = sign(dot(v, r_p))
    where r_p[i] = ±1 hash-derived. aggregate fold per plane."""
    bits = []
    for p in range(N_PLANES):
        dot = (
            f"aggregate(zip_with({vec_sql}, sequence(0, size({vec_sql}) - 1), "
            f"(x, i) -> cast(x as double) * {_plane_component_sql(p, 'i')}), "
            f"0d, (acc, v) -> acc + v)"
        )
        bits.append(f"(case when {dot} > 0 then {1 << p} else 0 end)")
    return "(" + " + ".join(bits) + ")"


def ann_lsh_topk(emb: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """ANN: exact cosine only within the query's LSH bucket. Recall<1 by
    design; the bucket join shuffles signatures, not vectors x queries."""
    sig = emb.withColumn("sig", F.expr(lsh_signature_expr("embedding")))
    q = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("sig").alias("qsig")
    )
    a = sig.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("av"), F.col("sig")
    )
    cand = (
        a.join(F.broadcast(q), F.col("sig") == F.col("qsig"))
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", F.expr(cosine_sim_expr("qv", "av")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", F.expr("cast(floor(cos * 10000) as bigint)").alias("cos_bp"))
    )


def embedding_near_dup_pairs(emb: DataFrame, min_cos_bp: int = 9500) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH-bucketed candidate pairs
    with exact cosine ≥ threshold. The near-dup variant of ann search."""
    sig = emb.withColumn("sig", F.expr(lsh_signature_expr("embedding")))
    l = sig.select(F.col("sig"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    r = sig.select(F.col("sig"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        l.join(r, on="sig")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.expr(f"cast(floor(({cosine_sim_expr('ea', 'eb')}) * 10000) as bigint)").alias("cos_bp"),
        )
        .filter(F.col("cos_bp") >= min_cos_bp)
    )
