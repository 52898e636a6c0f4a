"""LLM-pipeline keys built in r6 for the r7 driver window.

- ``stratified_sample`` — exact-quota per-stratum sampling: K
  documents per language, selected by a DETERMINISTIC multiplicative
  hash order (Knuth 2654435761 mod 2^32 — both engines compute it in
  exact BIGINT arithmetic, so unlike the xxhash64-gated sampling.py
  operators this key is FULLY oracled). Per-stratum rank via a
  window; at 100 TB the same selection runs as local per-partition
  top-K (each task keeps its K smallest hashes per stratum) merged by
  one tiny final top-K — the classic distributed-reservoir shape —
  and production hash-gated sampling uses the purpose-salted xxhash64
  operators (operators/sampling.py) where oracle parity is not
  required. doc_id tie-breaks equal hashes so the selection is a
  total order.
- ``topk_rollup`` — completes the mergeable-sketch rollup triple
  (distinct → hll_rollup, quantile → quantile_rollup, top-k → this):
  per-SOURCE heavy hitters materialized once at the finest grain
  (operators/sketches.heavy_hitters_by_key — per-key Misra-Gries +
  exact recount, vocabulary-size-independent shuffle), then merged
  to a GLOBAL candidate table by pure summation of the per-source
  survivor counts — the space-saving merge, no corpus rescan. Merged
  counts are LOWER BOUNDS (a token's count in sources where it is
  not locally frequent is unknown to the summaries), but the
  averaging argument guarantees every token globally ≥ f appears in
  some source at ≥ f, so the merged table CONTAINS all true global
  heavy hitters — the containment + bound properties are pinned in
  tests and the key is fully oracled (the survivor sets are exact
  and deterministic, so DuckDB reproduces both levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_STRAT_K = 40
_KNUTH = 2654435761  # 2^32 / golden ratio, odd — a full-period mixer
_MASK32 = 4294967296


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K docs per lang by multiplicative-hash order (doc_id * KNUTH
    mod 2^32 — products stay < 2^63 for any doc_id this corpus can
    reach, no ANSI overflow)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MASK32)
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("lang", "doc_id", "n_chars", h.alias("h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _STRAT_K)
        .select("lang", "doc_id", "n_chars", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


_TK_FRACTION = 0.005


def q_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source heavy hitters + their summation-merged global
    lower-bound table (see module doc). Output: (source, is_total,
    token, n) — source NULL + is_total marks the rollup rows."""
    from stock_data_project_spark.operators.sketches import heavy_hitters_by_key

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    per_source = heavy_hitters_by_key(
        docs, key_col="source", min_fraction=_TK_FRACTION
    )
    typed = per_source.select(
        "source", F.lit(False).alias("is_total"), "token", "n"
    )
    total = per_source.groupBy("token").agg(F.sum("n").alias("n")).select(
        F.lit(None).cast("string").alias("source"),
        F.lit(True).alias("is_total"),
        "token",
        "n",
    )
    return typed.unionByName(total)


QUERIES_NEXT = {
    "stratified_sample": q_stratified_sample,
    "topk_rollup": q_topk_rollup,
}

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

ORACLE_NEXT = {
    # the per-source survivor sets are exact (MG candidates are
    # recounted exactly and thresholded), so both levels of the
    # rollup are deterministic SQL
    "topk_rollup": rf"""
        WITH toks AS (
            SELECT source, unnest(string_split({_NORM}, ' ')) AS token
            FROM documents WHERE text IS NOT NULL
        ), cnt AS (
            SELECT source, token, count(*) AS n FROM toks
            WHERE token <> '' GROUP BY 1, 2
        ), tot AS (
            -- DOUBLE total like the frequent_tokens oracle: the
            -- threshold product must be double×double on both engines
            -- (hugeint×decimal would differ at exact-integer bounds)
            SELECT source, CAST(sum(n) AS DOUBLE) AS total FROM cnt GROUP BY 1
        ), hh AS (
            SELECT c.source, c.token, c.n
            FROM cnt c JOIN tot t USING (source)
            WHERE c.n >= t.total * {_TK_FRACTION}
        )
        SELECT source, FALSE AS is_total, token, n FROM hh
        UNION ALL
        SELECT NULL, TRUE, token, CAST(sum(n) AS BIGINT)
        FROM hh GROUP BY token
    """,
    "stratified_sample": f"""
        WITH h AS (
            SELECT lang, doc_id, n_chars,
                   (doc_id * {_KNUTH}) % {_MASK32} AS h
            FROM documents WHERE lang IS NOT NULL
        )
        SELECT lang, doc_id, n_chars,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY h, doc_id) AS INT)
                   AS sample_rank
        FROM h
        QUALIFY sample_rank <= {_STRAT_K}
    """,
}
