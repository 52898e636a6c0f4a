"""Graph-ANN: the NN-Descent kNN graph as a FULLY-oracled key
(r12 build closing the one named ANN-family gap — r11 verdict: "HNSW
/ graph-ANN — design note only").

``knn_graph`` runs ``operators/nndescent.knn_graph`` (k=5, 3
NN-Descent rounds) over the embeddings table and returns the final
graph (vec_id, neighbor_id, cosine_sim, rank). The ALGORITHM — not
just its output shape — is engine-replayable, so the DuckDB oracle
replays the iteration exactly, unrolled:

- init buckets: two engine-neutral Knuth multiplicative hashes
  (plain BIGINT arithmetic, the source_quota_resample recipe),
  bucket count = greatest(1, n div (k+1)) from the same count both
  engines;
- per round: reverse edges capped at k per node (row_number by (sim
  DESC, src ASC)), symmetrized edge set, neighbor-of-neighbor
  expansion, union with current edges, rescore, per-node top-k by
  (sim DESC, dst ASC) — cosine rounded to 6dp BEFORE ranking on both
  engines (np unit-row dot vs list_cosine_similarity, the
  ann_cosine_topk-proven pairing), so the edge STATE matches by
  induction round over round;
- iteration CTEs are AS MATERIALIZED (DuckDB inlines plain CTEs per
  reference — the kcore 5^R blowup rule).

Approximation quality (recall vs the exact brute-force graph) is a
statistical property, not an oracle-able one — pinned in
tests/test_next15_staged.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.nndescent import _SALT_A, _SALT_B, knn_graph

_K = 5
_ITERS = 3


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, k=_K, iters=_ITERS)
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return g.select(
        F.col("src").alias("vec_id"),
        F.col("dst").alias("neighbor_id"),
        F.col("sim").alias("cosine_sim"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def _score_rank_sql(cand: str, k: int) -> str:
    """Score a candidate CTE against the vector table and keep the
    per-source top-k — the shared tail of every round."""
    # NaN-null the degenerate (zero-norm) case: DuckDB's
    # list_cosine_similarity returns NaN there, which sorts ABOVE all
    # reals and passes IS NOT NULL — while the Spark kernel
    # (pair_cosine) maps the same row to NULL and drops it. CASE-null
    # keeps both engines excluding degenerate rows identically
    # (r12 ADVICE; current testdata has no zero vectors, so this is
    # a regeneration-proofing guard).
    sim = (
        "CASE WHEN isnan(list_cosine_similarity(a.v, b.v)) THEN NULL "
        "ELSE round(list_cosine_similarity(a.v, b.v), 6) END"
    )
    return f"""
    SELECT src, dst, sim FROM (
        SELECT c.src, c.dst,
               {sim} AS sim,
               row_number() OVER (
                   PARTITION BY c.src
                   ORDER BY {sim}
                       DESC NULLS LAST, c.dst ASC) AS r
        FROM {cand} c JOIN ev a ON c.src = a.id JOIN ev b ON c.dst = b.id
    ) WHERE r <= {k} AND sim IS NOT NULL"""


def _knn_graph_sql(k: int, iters: int) -> str:
    parts = [
        f"""
    WITH ev AS MATERIALIZED (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), params AS (
        SELECT greatest(1, count(*) // {k + 1}) AS nb FROM ev
    ), bk AS MATERIALIZED (
        SELECT id,
               ((((id % 2147483648) + 2147483648) % 2147483648)
                * {_SALT_A}) % 4294967296 % nb AS b1,
               ((((id % 2147483648) + 2147483648) % 2147483648)
                * {_SALT_B}) % 4294967296 % nb AS b2
        FROM ev, params
    ), cand0 AS (
        SELECT a.id AS src, b.id AS dst
        FROM bk a JOIN bk b ON a.b1 = b.b1 AND a.id <> b.id
        UNION
        SELECT a.id AS src, b.id AS dst
        FROM bk a JOIN bk b ON a.b2 = b.b2 AND a.id <> b.id
    ), e0 AS MATERIALIZED ({_score_rank_sql('cand0', k)})"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""", rev{i} AS (
        SELECT dst AS src, src AS dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY dst
                       ORDER BY sim DESC NULLS LAST, src ASC) AS r
            FROM e{p}
        ) WHERE r <= {k}
    ), sym{i} AS MATERIALIZED (
        SELECT src, dst FROM e{p} UNION SELECT src, dst FROM rev{i}
    ), cand{i} AS (
        SELECT src, dst FROM e{p}
        UNION
        SELECT x.src, y.dst
        FROM sym{i} x JOIN sym{i} y ON x.dst = y.src AND x.src <> y.dst
    ), e{i} AS MATERIALIZED ({_score_rank_sql(f'cand{i}', k)})"""
        )
    parts.append(
        f"""
    SELECT src AS vec_id, dst AS neighbor_id, sim AS cosine_sim,
           CAST(row_number() OVER (PARTITION BY src
                ORDER BY sim DESC, dst ASC) AS INT) AS rank
    FROM e{iters}"""
    )
    return "".join(parts)


QUERIES_NEXT = {
    "knn_graph": q_knn_graph,
}

ORACLE_NEXT = {
    "knn_graph": _knn_graph_sql(_K, _ITERS),
}
