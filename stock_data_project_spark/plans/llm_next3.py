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


QUERIES_NEXT = {
    "stratified_sample": q_stratified_sample,
}

ORACLE_NEXT = {
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
