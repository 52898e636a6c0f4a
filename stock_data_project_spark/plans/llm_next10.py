"""LLM-pipeline key built in r10, staged for the r12 window.

``ann_recall_eval`` — a FULLY-oracled recall@k grade for the IVF
approximate-search path (the r9 verdict's item 6: the approximate
family's quality previously lived only in repo tests as recall
floors). The image_phash_dedup planted-construction recipe applied in
vector space:

- PLANTED CORPUS: every embedding row is replaced by its group
  anchor's vector (groups of ``_AR_K = 5`` consecutive vec_ids), so
  each complete group is 5 BIT-IDENTICAL vectors. Identical inputs
  through the deterministic IVF kernels (same centroid matrix, same
  argmax) land in the SAME cell no matter how Arrow batches split
  them — the quantizer provably cannot separate a group.
- QUERIES: every ``_AR_QSTRIDE``-th group's anchor vector under a
  fresh NEGATIVE id (-anchor-1), so the kernel's self-exclusion
  (``nids != qid``) never removes a corpus row.
- MARGIN: within-group cosine is the unit self-dot — 1.0 after the
  kernel's 6dp rounding (ulp noise is ~1e-15, nowhere near the
  5e-7 boundary) — while cross-anchor cosines on the synthetic
  near-uniform vectors stay below ~0.6 (asserted < 0.999999 in the
  staged tests at sf0.01 and sf0.1). Ranking ties inside a group
  break by ascending neighbor_id (ivf_topk's explicit ordering).

Consequence: IVF recall@5 is PROVABLY 1.0 and the retrieved set is
pure doc_id arithmetic — top1 = the anchor (lowest id at the tie),
sum of retrieved in-group ids = 25·gid + 10. The oracle states that
arithmetic; any routing / assignment / ranking / dedup regression in
operators/ivf.py shifts the measured values and fails the hash. This
grades the ivf path's CORRECTNESS-critical plumbing; the statistical
recall floors on non-planted data stay pinned in tests/test_ivf.py
(0.56-0.68 at the benchmarked parameters — approximate by design).

Scale shape: one gid equi-join builds the planted corpus (hash join,
no broadcast of a corpus-sized side), then the standard ivf_fit /
ivf_topk lifecycle — fit shuffles are map-side-combined k×dim cells,
search candidates are |Q| × (nprobe/k) × corpus.

Reference parity note: the reference has no ANN surface; this grades
the repo's own FAISS-recipe family (SURVEY §2C) the way its media
keys grade the codec family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_AR_K = 5  # group size == top-k
_AR_QSTRIDE = 4  # every 4th complete group is queried


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.operators.ivf import ivf_fit, ivf_topk
    from stock_data_project_spark.operators.memo import session_memo

    emb = load_table(spark, sf_dir, "embeddings")
    members = emb.select("vec_id", F.expr(f"vec_id DIV {_AR_K}").alias("gid"))
    anchors = emb.filter(F.col("vec_id") % _AR_K == 0).select(
        F.expr(f"vec_id DIV {_AR_K}").alias("gid"),
        F.col("embedding").alias("a_emb"),
    )
    # complete groups only — robust to a corpus tail that isn't a
    # multiple of the group size (the current testdata always is)
    full = (
        members.groupBy("gid").count().filter(F.col("count") == _AR_K).select("gid")
    )
    planted = (
        members.join(full, "gid")
        .join(anchors, "gid")
        .select("vec_id", F.col("a_emb").alias("embedding"))
    )
    queries = (
        anchors.join(full, "gid")
        .filter(F.col("gid") % _AR_QSTRIDE == 0)
        .select(
            (-(F.col("gid") * _AR_K) - 1).alias("vec_id"),
            F.col("a_emb").alias("embedding"),
        )
    )
    # immutable sf_dir → identical planted corpus → identical
    # quantizer; memoize the metadata-sized centroid table so
    # steady-state evaluations skip the fit jobs (the ann_ivf
    # pattern). The PLANTED key namespace keeps it distinct from
    # ann_ivf's raw-corpus centroids.
    centroids = session_memo(
        spark,
        ("ivf_centroids_planted", sf_dir, _AR_K, 3),
        lambda: ivf_fit(planted, iters=3),
    )
    topk = ivf_topk(planted, queries, k=_AR_K, centroids=centroids)
    anchor = -F.col("query_id") - 1
    in_group = F.expr(f"neighbor_id DIV {_AR_K}") == F.expr(
        f"(-query_id - 1) DIV {_AR_K}"
    )
    return topk.groupBy(anchor.alias("anchor_id")).agg(
        F.round(
            F.sum(F.when(in_group, 1).otherwise(0)) / F.lit(float(_AR_K)), 6
        ).alias("recall"),
        F.min(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("top1_id"),
        F.sum(F.when(in_group, F.col("neighbor_id"))).alias("retrieved_group_sum"),
    )


QUERIES_NEXT = {"ann_recall_eval": q_ann_recall_eval}

ORACLE_NEXT = {
    # the planted arithmetic (module doc): recall provably 1.0, top1 =
    # anchor, in-group id sum = 25·gid + 10; only complete groups
    # queried. CASTs per the DuckDB dialect rules (INT literal × BIGINT
    # stays BIGINT here, but the explicit CAST pins sum(bigint) parity).
    "ann_recall_eval": f"""
        WITH full_g AS (
            SELECT CAST(vec_id AS BIGINT) // {_AR_K} AS gid
            FROM embeddings
            GROUP BY 1
            HAVING count(*) = {_AR_K}
        )
        SELECT CAST(gid * {_AR_K} AS BIGINT) AS anchor_id,
               round(CAST(1.0 AS DOUBLE), 6) AS recall,
               CAST(gid * {_AR_K} AS BIGINT) AS top1_id,
               CAST(gid * {_AR_K * _AR_K} + {_AR_K * (_AR_K - 1) // 2} AS BIGINT)
                   AS retrieved_group_sum
        FROM full_g
        WHERE gid % {_AR_QSTRIDE} = 0
    """,
}
