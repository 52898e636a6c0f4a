"""Vector similarity search over an embedding column.

- ``cosine_topk``: brute-force exact top-k — the correctness
  baseline. Query side is broadcast; the big side streams, so the
  plan is scan -> broadcast nested-loop -> per-query top-k. At
  100 TB the partial top-k is taken per partition before the final
  shuffle (window over query_id), so the shuffle is k·|queries|.
- ``lsh_topk``: random-hyperplane LSH — the scale path. Plane
  coefficients derive deterministically from xxhash64 of (table,
  plane, dimension-index), so signatures are reproducible with no
  stored model. Only bucket collisions are compared.

Pairwise vector math runs as BLAS GEMM inside Arrow-batched kernels
(brute-force scoring) — Spark's higher-order-function folds are
interpreted per element and were measured ~4× slower; the
single-pair helpers below (``dot``/``cosine``/``unit``) stay as
Column expressions for candidate-set scoring where the pair list is
already pruned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI error) when either vector is all-zero."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def unit(a: Column) -> Column:
    """Vector scaled to unit norm (as doubles). Pre-normalizing each
    side once turns per-pair cosine into a single dot fold — the
    norms would otherwise be recomputed for every candidate pair
    (measured 3× slower on pairwise workloads). An all-zero vector
    normalizes to NULL elements (its cosine is undefined; plain
    division would raise under ANSI mode)."""
    n = norm(a)
    return F.transform(a, lambda x: F.try_divide(x.cast("double"), n))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-match
    excluded). Ties broken by neighbor id for determinism.

    Scale shape: the query side is metadata-sized by contract (it was
    already the broadcast side relationally), so its normalized
    matrix ships in the kernel closure — the same lifecycle as the
    IVF centroid matrix. Each corpus Arrow batch scores via ONE BLAS
    GEMM and emits only its LOCAL top-k per query, so the shuffle
    into the global ranking carries ≤ batches × |Q| × k rows, never
    the |corpus| × |Q| score matrix. (The r1-r3a formulation —
    crossJoin + interpreted aggregate/zip_with dot folds — was
    measured ~4× slower at sf0.1; sims are rounded to 6dp BEFORE
    ranking on both this and the oracle side, the repo-wide parity
    rule, so GEMM summation order cannot flip the hash.)

    Degenerate (zero/non-finite norm) vectors have no defined cosine:
    they are excluded as neighbors and produce no rows as queries.
    """
    import numpy as np
    import pandas as pd

    from stock_data_project_spark.operators.linalg import first_dim, to_matrix, unit_rows

    q_pdf = queries.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")).toPandas()
    dim = first_dim(q_pdf["_qv"])
    if dim is None:
        qids = np.array([])
        qm_t = np.zeros((0, 0))
    else:
        qm = unit_rows(to_matrix(q_pdf["_qv"], dim))
        q_ok = qm.any(axis=1)  # degenerate queries produce no rows
        qm_t = qm[q_ok].T
        qids = q_pdf["_qid"].to_numpy()[q_ok]

    from pyspark.sql import types as T

    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty or len(qids) == 0:
                continue
            m = unit_rows(to_matrix(pdf[vec_col], dim))
            ok = m.any(axis=1)  # NULL/zero/ragged neighbors excluded
            sims = np.round(m @ qm_t, 6)
            nids = pdf[id_col].to_numpy()
            frames = []
            for j, qid in enumerate(qids):
                mask = ok & (nids != qid)
                cand_ids, cand_s = nids[mask], sims[mask, j]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand_s))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[order],
                            "cosine_sim": cand_s[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    scored = embeddings.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with OR-amplified LSH: ``tables``
    independent hyperplane tables; a pair is a candidate if it
    collides in ANY table (recall 1-(1-p^planes)^tables), then
    exact-rank the survivors by true cosine. Plane coefficients are
    ±1 from xxhash64(table, plane, dimension-index) — model-free and
    dimension-agnostic. The bucket key space is (table, bucket) so
    one equi-join covers all tables. Approximate by design ->
    rows-only check.

    Tuning note (measured on the synthetic testdata, which is
    near-uniform — LSH's adversarial case): 4 planes × 8 tables gives
    recall@5 ≈ 0.76; the default 4×16 ≈ 0.92 — the defensible config
    is the default. On real embedding corpora the neighbor/
    non-neighbor collision-probability gap is much larger, so the
    same construction prunes far more aggressively; raise ``planes``
    as cluster structure sharpens."""
    def banded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        # all tables*planes projections as codegen'd sums over the
        # exploded vector (interpreted per-plane folds measured ~10×
        # slower), then pack sign bits into per-table bucket ids
        exploded = df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(F.col(vec_col)).alias("_j", "_x"),
        )
        projs = [
            F.sum(
                F.col("_x").cast("double")
                * F.when(
                    F.xxhash64(F.lit(t), F.lit(p), F.col("_j")).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).alias(f"_pr_{t}_{p}")
            for t in range(tables)
            for p in range(planes)
        ]
        agg = exploded.groupBy(out_id).agg(*projs)
        bucket_structs = []
        for t in range(tables):
            b = F.lit(0)
            for p in range(planes):
                b = b + F.when(F.col(f"_pr_{t}_{p}") >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket_structs.append(F.struct(F.lit(t).alias("t"), b.cast("int").alias("b")))
        sigs = agg.select(out_id, F.explode(F.array(*bucket_structs)).alias("bk")).select(
            out_id, "bk.t", "bk.b"
        )
        vecs = df.select(F.col(id_col).alias(out_id), unit(F.col(vec_col)).alias(out_vec))
        return sigs.join(vecs, out_id)

    e = banded(embeddings, "neighbor_id", "neighbor_vec")
    q = banded(queries, "query_id", "query_vec")
    scored = (
        e.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("query_vec"), F.col("neighbor_vec")), 6).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
