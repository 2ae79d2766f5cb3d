#!/usr/bin/env python
"""Scale evidence for the LLM-data operators (VERDICT r3 item 7).

MinHash near-dup + ANN LSH + ANN IVF over a synthetic 10M-doc /
10M-vector corpus at local[8] vs local[32], recording wall time per
operator and the band/bucket-skew distribution — measurement for the
scale rules the geometry choosers encode (dedup.choose_minhash_geometry,
similarity planes ≈ log2(corpus/bucket)).

The corpus is synthesized with pure codegen SQL (no Python in the
generate path): ~10% of docs/vectors are near-dup twins of their
predecessor so the operators have real positives to find.

    python scripts/dataops_scaling.py --cores 8  --out BENCH/scaling_r4/dataops_c8.json
    python scripts/dataops_scaling.py --cores 32 --out BENCH/scaling_r4/dataops_c32.json

Round-5 additions (VERDICT r4 items 1/2/6): --ops selects a subset
(e.g. --ops ivf for the tiled-probe rerun), the ANN legs record
recall-vs-bruteforce over the sampled queries (exact ground truth via
the Arrow-matmul brute force — cheap) with floors asserted, and a
dedup-clusters leg times connected components + survivor selection
over the 10M-doc near-dup pair graph.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_DATAOPS_DOCS", "10000000"))
N_VECS = int(os.environ.get("SPARK_GRAFT_DATAOPS_VECS", "10000000"))
DIM = 64
N_QUERIES, K = 100, 10
# scale rule applied (similarity.py: planes ~= log2(corpus/bucket)):
# 12 planes -> 4096 buckets/table -> ~2.4k rows/bucket at 10M
ANN_PLANES_AT_10M = 12
IVF_STRIDE_AT_10M = 3162  # codebook ~= sqrt(N)


def synth_docs(spark, n: int):
    """Deterministic docs; id % 10 == 1 is a near-twin of id-1 (same 30
    tokens + one extra), everything else unique. Pure codegen."""
    from pyspark.sql import functions as F

    base = "id - CAST(id % 10 = 1 AS BIGINT)"
    tokens = (
        "transform(sequence(0, 29), "
        f"j -> substr(md5(concat('w', CAST({base} AS STRING), ':', "
        "CAST(j AS STRING))), 1, 8))"
    )
    text = (
        f"concat_ws(' ', concat({tokens}, CASE WHEN id % 10 = 1 THEN "
        "array(substr(md5(concat('x', CAST(id AS STRING))), 1, 8)) "
        "ELSE CAST(array() AS ARRAY<STRING>) END))"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.expr(text).alias("text")
    )


def synth_vecs(spark, n: int, dim: int):
    """Deterministic embeddings; id % 10 == 1 is a tiny perturbation of
    id-1 (cos > 0.999), everything else effectively random."""
    from pyspark.sql import functions as F

    base = "id - CAST(id % 10 = 1 AS BIGINT)"
    comp = (
        "CAST(CAST(conv(substr(md5(concat('e', CAST({b} AS STRING), ':', "
        "CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2000 - 1000 AS FLOAT)"
        " / 1000.0"
    ).format(b=base)
    jitter = (
        "CASE WHEN id % 10 = 1 THEN CAST(CAST(conv(substr(md5(concat('j', "
        "CAST(id AS STRING), ':', CAST(i AS STRING))), 1, 8), 16, 10) AS "
        "BIGINT) % 20 - 10 AS FLOAT) / 1000.0 ELSE CAST(0.0 AS FLOAT) END"
    )
    vec = (
        f"transform(sequence(0, {dim - 1}), "
        f"i -> CAST({comp} + {jitter} AS FLOAT))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def bucket_skew(df, keys: list[str]) -> dict:
    """max / p99 / mean bucket size over the given grouping keys."""
    from pyspark.sql import functions as F

    sizes = df.groupBy(*keys).count()
    row = sizes.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    return {
        "max": int(row.mx),
        "p99": int(row.p99),
        "mean": round(float(row.mean), 1),
        "n_buckets": int(row.n_buckets),
    }


def _topk_sets(df) -> dict:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.vid)
    return out


def _recall(exact: dict, approx: dict) -> float:
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / max(total, 1)


def _twin_of(qid: int) -> int | None:
    """The planted near-twin of a query id (synth_vecs: id%10==1 is a
    cos>0.999 perturbation of id-1), or None if the query has none."""
    if qid % 10 == 1:
        return qid - 1
    if qid % 10 == 0:
        return qid + 1
    return None


def _twin_recall(approx: dict, n_queries: int) -> float:
    """Fraction of planted twins recovered — the honest ANN gate on
    this corpus: every non-twin vector is a random 64-dim point, so a
    query's exact top-k beyond its twin are near-orthogonal 'neighbors'
    (cos ≈ 0.3-0.4) that bucketed ANN is EXPECTED to miss; overall
    recall@k is reported but the floor belongs on the true planted
    neighbors (cos > 0.999)."""
    qs = [q for q in range(n_queries) if _twin_of(q) is not None]
    hits = sum(1 for q in qs if _twin_of(q) in approx.get(q, set()))
    return hits / max(len(qs), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument(
        "--ops", type=str, default="minhash,lsh,ivf,clusters",
        help="comma list of minhash,lsh,ivf,clusters",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    from pyspider_spark.session import get_spark
    from pyspider_spark.data import dedup as D
    from pyspider_spark.data import similarity as S
    from pyspark.sql import functions as F

    spark = get_spark(f"dataops-{args.cores}", cores=args.cores)
    spark.range(1000).count()
    out: dict = {"cores": args.cores, "n_docs": N_DOCS, "n_vecs": N_VECS}
    # floor breaches are recorded and raised AFTER the JSON write, so a
    # failed gate never discards hours of already-measured legs
    failures: list[str] = []

    if "minhash" in ops:
        # ---- MinHash near-dup at the 10M geometry (32x8) ----------------
        n_mh, n_bands = D.choose_minhash_geometry(N_DOCS)
        docs = synth_docs(spark, N_DOCS)
        t0 = time.perf_counter()
        pairs = D.minhash_near_dups(
            docs, threshold_bp=7000, n_minhash=n_mh, n_bands=n_bands
        )
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        sigs = D.minhash_signature(docs, n_minhash=n_mh, n_bands=n_bands)
        band_rows = sigs.select(
            F.posexplode(F.array(*[f"band{b}" for b in range(n_bands)])).alias(
                "band", "key"
            )
        )
        out["minhash"] = {
            "geometry": f"{n_mh}x{n_bands}",
            "seconds": round(dt, 1),
            "pairs": n_pairs,
            "docs_per_sec": round(N_DOCS / dt),
            "band_bucket_skew": bucket_skew(band_rows, ["band", "key"]),
        }
        spark.catalog.clearCache()
        print(json.dumps(out["minhash"]), flush=True)

    if "clusters" in ops:
        # ---- dedup clusters: pairs → connected components → survivors --
        # (VERDICT r4 item 1: the 10M-doc timing row). Pairs are built
        # at the same 10M geometry; the cluster step is timed separately
        # from pair generation so the row isolates the CC cost.
        n_mh, n_bands = D.choose_minhash_geometry(N_DOCS)
        docs = synth_docs(spark, N_DOCS)
        from pyspark import StorageLevel

        pairs = D.minhash_near_dups(
            docs, threshold_bp=7000, n_minhash=n_mh, n_bands=n_bands
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_pairs = pairs.count()  # materialize before the clock starts
        t0 = time.perf_counter()
        clusters = D.dedup_clusters(pairs)
        n_members = clusters.count()
        n_clusters = clusters.filter("is_survivor").count()
        dt = time.perf_counter() - t0
        out["dedup_clusters"] = {
            "pairs": n_pairs,
            "cluster_members": n_members,
            "clusters": n_clusters,
            "losers": n_members - n_clusters,
            "seconds": round(dt, 1),
            "pairs_per_sec": round(n_pairs / max(dt, 1e-9)),
        }
        # the synthetic corpus plants twin pairs (id, id+1 at id%10==1):
        # every planted pair must resolve to a 2-member cluster
        if not (n_clusters > 0 and n_members == 2 * n_clusters):
            failures.append(f"cluster shape: {out['dedup_clusters']}")
        pairs.unpersist()
        spark.catalog.clearCache()
        print(json.dumps(out["dedup_clusters"]), flush=True)

    emb = synth_vecs(spark, N_VECS, DIM) if ("lsh" in ops or "ivf" in ops) else None
    exact_sets = None
    if emb is not None:
        # exact ground truth for recall: Arrow-matmul brute force over
        # the full corpus for the N_QUERIES sampled queries (~10-20 s at
        # 10M x 64 — cheap next to the ANN legs themselves)
        t0 = time.perf_counter()
        exact_sets = _topk_sets(
            S.cosine_topk_vectorized(emb, n_queries=N_QUERIES, k=K)
        )
        out["bruteforce_gt_seconds"] = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()

    if "lsh" in ops:
        # ---- ANN LSH at the 10M plane count -----------------------------
        t0 = time.perf_counter()
        topk = S.ann_lsh_topk(
            emb, n_queries=N_QUERIES, k=K, n_tables=S.N_TABLES,
            n_planes=ANN_PLANES_AT_10M,
        )
        approx = _topk_sets(topk)
        dt = time.perf_counter() - t0
        recall = _recall(exact_sets, approx)
        twin = _twin_recall(approx, N_QUERIES)
        sig_arr = S.all_table_sigs_udf(S.N_TABLES, ANN_PLANES_AT_10M)(
            F.col("embedding")
        )
        slim = emb.select(F.posexplode(sig_arr).alias("t", "sig"))
        out["ann_lsh"] = {
            "tables_x_planes": f"{S.N_TABLES}x{ANN_PLANES_AT_10M}",
            "seconds": round(dt, 1),
            "topk_rows": sum(len(v) for v in approx.values()),
            "vecs_per_sec": round(N_VECS / dt),
            "recall_at_k": round(recall, 3),
            "twin_recall": round(twin, 3),
        }
        out["ann_lsh"]["sig_bucket_skew"] = bucket_skew(slim, ["t", "sig"])
        # floor on the planted cos>0.999 twins — the true near
        # neighbors this corpus contains (see _twin_recall docstring)
        if twin < 0.8:
            failures.append(f"LSH twin recall collapsed: {twin:.3f}")
        spark.catalog.clearCache()
        print(json.dumps(out["ann_lsh"]), flush=True)

    if "ivf" in ops:
        # ---- ANN IVF at the sqrt(N) codebook ----------------------------
        t0 = time.perf_counter()
        topk = S.ann_ivf_topk(
            emb, n_queries=N_QUERIES, k=K, stride=IVF_STRIDE_AT_10M
        )
        approx = _topk_sets(topk)
        dt = time.perf_counter() - t0
        recall = _recall(exact_sets, approx)
        twin = _twin_recall(approx, N_QUERIES)
        out["ann_ivf"] = {
            "codebook": N_VECS // IVF_STRIDE_AT_10M + 1,
            "seconds": round(dt, 1),
            "topk_rows": sum(len(v) for v in approx.values()),
            "vecs_per_sec": round(N_VECS / dt),
            "recall_at_k": round(recall, 3),
            "twin_recall": round(twin, 3),
        }
        if twin < 0.8:
            failures.append(f"IVF twin recall collapsed: {twin:.3f}")
        print(json.dumps(out["ann_ivf"]), flush=True)

    if failures:
        out["assert_failures"] = failures
    payload = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    print(payload)
    spark.stop()
    if failures:
        raise AssertionError("; ".join(failures))


if __name__ == "__main__":
    main()
