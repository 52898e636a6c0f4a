"""LLM-pipeline keys built in r7, staged for the r8 driver window.

- ``semantic_dedup`` — SemDeDup-style embedding-cluster semantic
  deduplication (Abbas et al. 2023: cluster the corpus, keep one
  representative per semantic cluster, drop members within a cosine
  threshold of it). The production blocking key is the IVF quantizer
  cell (``embedding_dedup_ivf``); k-means is not SQL-expressible, so
  THIS key swaps in the deterministic axis-sign quantizer — cell =
  sign-bit code of the first B embedding dimensions, exactly
  computable by both engines — which makes the whole pipeline FULLY
  oracled: cell assignment, per-cell unit-vector centroid (rounded
  6dp), representative = max cosine-to-centroid (vec_id tie-break),
  and the drop rule cos(doc, rep) ≥ τ are all deterministic
  arithmetic DuckDB reproduces verbatim.

  Output is integer-only per cell — (cell, rep_id, n_docs, n_dup) —
  so no float ever reaches the grader: cosines feed only comparisons
  (argmax + threshold), where the 6dp rounding parity rule is what
  keeps the two engines' decisions aligned.

  Scale shape: ONE hash shuffle on the cell key, then a block-local
  Arrow/numpy kernel per cell that is LINEAR in the block — a
  (|cell| × d) GEMM against the centroid and one against the
  representative — never all-pairs (contrast ``embedding_dedup``,
  whose within-block pairing is the quadratic true-pair path). B
  (cell bits) scales as log2(n / target_cell_rows): 4 bits ≈ 16
  cells at this corpus size; a 100 TB corpus uses more bits (or the
  IVF cells) so blocks stay executor-sized and parallelism stays
  wide. Reference parity: the reference has no embedding pipeline
  (fetch_stocks.py is price ingest); this family is the
  training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_SD_BITS = 4
_SD_TAU = 0.3


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module doc. The dim probe is one metadata-sized job
    (mirrored as a scalar subquery in the oracle) so a regenerated
    testdata dimensionality can never silently empty the key."""
    import numpy as np
    import pandas as pd

    from stock_data_project_spark.operators.linalg import to_matrix, unit_rows

    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.agg(F.max(F.size("embedding"))).collect()[0][0]
    if not d or d <= 0:
        raise ValueError("semantic_dedup: no embeddings")

    # sign-bit cell code, NULL dims read as 0-bits on both engines
    cell = sum(
        (
            F.when(F.get("embedding", i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(_SD_BITS)
        ),
        start=F.lit(0),
    )
    valid = emb.filter(F.size("embedding") == d).select(
        "vec_id", "embedding", cell.cast("int").alias("cell")
    )

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # canonical row order FIRST: the centroid mean (and therefore
        # every rounded cosine) must not depend on shuffle arrival
        # order — float summation is order-sensitive in the last bit
        # (the layout-determinism rule; embedding_dedup sorts too)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = to_matrix(pdf["embedding"].to_numpy(), d)
        u = unit_rows(m)
        norms = np.linalg.norm(u, axis=1)
        keep = norms > 0  # NULL / ragged / zero-norm rows degrade per-row
        if not keep.any():
            return pd.DataFrame(
                {"cell": [], "rep_id": [], "n_docs": [], "n_dup": []}
            ).astype({"cell": "int32", "rep_id": "int64", "n_docs": "int64", "n_dup": "int64"})
        u, norms = u[keep], norms[keep]
        ids = pdf["vec_id"].to_numpy()[keep]
        cent = np.round(u.mean(axis=0), 6)
        cnorm = float(np.linalg.norm(cent))
        if cnorm > 0:
            sim_c = np.round((u @ cent) / (norms * cnorm), 6)
        else:
            sim_c = np.zeros(len(ids))
        rep = np.lexsort((ids, -sim_c))[0]
        sim_r = np.round((u @ u[rep]) / (norms * norms[rep]), 6)
        n_dup = int((sim_r >= _SD_TAU).sum()) - 1  # rep's self-sim is 1.0
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "rep_id": [int(ids[rep])],
                "n_docs": [int(keep.sum())],
                "n_dup": [n_dup],
            }
        )

    return valid.groupBy("cell").applyInPandas(
        per_cell, schema="cell int, rep_id long, n_docs long, n_dup long"
    )


QUERIES_NEXT = {"semantic_dedup": q_semantic_dedup}

_SD_CELL_SQL = " + ".join(
    f"CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END" for i in range(_SD_BITS)
)

ORACLE_NEXT = {
    "semantic_dedup": f"""
        WITH dim AS (
            SELECT max(len(embedding)) AS d FROM embeddings
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings, dim
            WHERE len(embedding) = d
              AND coalesce(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])), 0) > 0
        ),
        cells AS (
            SELECT vec_id,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u,
                   CAST({_SD_CELL_SQL} AS INT) AS cell
            FROM e
        ),
        cent AS (
            SELECT cell, idx, round(avg(val), 6) AS c
            FROM (
                SELECT cell, unnest(u) AS val,
                       generate_subscripts(u, 1) AS idx
                FROM cells
            )
            GROUP BY 1, 2
        ),
        centl AS (
            SELECT cell, list(c ORDER BY idx) AS cv FROM cent GROUP BY 1
        ),
        simc AS (
            SELECT s.vec_id, s.cell, s.u,
                   CASE WHEN list_dot_product(c.cv, c.cv) > 0
                        THEN round(list_cosine_similarity(s.u, c.cv), 6)
                        ELSE 0.0 END AS sim_c
            FROM cells s JOIN centl c USING (cell)
        ),
        rep AS (
            SELECT cell, vec_id AS rep_id, u AS rep_u
            FROM simc
            QUALIFY row_number() OVER (PARTITION BY cell
                                       ORDER BY sim_c DESC, vec_id) = 1
        )
        SELECT s.cell, r.rep_id,
               count(*) AS n_docs,
               CAST(count(*) FILTER (
                   s.vec_id <> r.rep_id
                   AND round(list_cosine_similarity(s.u, r.rep_u), 6)
                       >= {_SD_TAU}
               ) AS BIGINT) AS n_dup
        FROM simc s JOIN rep r USING (cell)
        GROUP BY 1, 2
    """,
}
