"""LLM-pipeline keys built in r9, staged for the r10 driver window.

- ``chunk_documents`` — sliding-window token chunking, the training-
  prep step between cleaning and packing (RAG indexers and
  context-window builders run exactly this): 64-token windows at
  stride 48 (16-token overlap), chunk i covering tokens
  [i·48, i·48+64) for i in [0, ceil(n/48)) — every token covered,
  trailing chunks shorter. All construction is NATIVE collection
  exprs (split → sequence/explode → slice → concat_ws): the work is
  row-local slicing that feeds no aggregation, so the
  explode+codegen rule does not apply and zero shuffles exist
  anywhere in the plan (one map-side scan at any corpus size). The
  graded chunk identity is md5(chunk_text) — identical hex on both
  engines — so the oracle (string_split → range → list_slice →
  array_to_string → md5) checks the exact reconstruction of every
  chunk boundary, not just counts. Complements ``pack_sequences``
  (greedy bin packing AFTER chunking) and ``chunked_lag`` (windowed
  series chunking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.textops import words
from stock_data_project_spark.plans.llm import _NORM

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    n_chunks = F.expr(f"(size(w) + {_CHUNK_STRIDE - 1}) div {_CHUNK_STRIDE}")
    idx = docs.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice("w", F.col("chunk_idx") * _CHUNK_STRIDE + 1, _CHUNK_SIZE)
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


_CHUNK_SQL = f"""
    WITH d AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
    ), c AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               list_slice(w, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT),
                          least(CAST(i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}
                                     AS BIGINT),
                                CAST(len(w) AS BIGINT))) AS chunk
        FROM (SELECT doc_id, w,
                     unnest(range((len(w) + {_CHUNK_STRIDE - 1})
                                  // {_CHUNK_STRIDE})) AS i
              FROM d)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM c
"""


QUERIES_NEXT = {"chunk_documents": q_chunk_documents}

ORACLE_NEXT = {"chunk_documents": _CHUNK_SQL}
