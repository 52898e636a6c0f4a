"""LLM-pipeline key built at the close of r10, staged for the r13
window.

``minhash_recall_eval`` — a FULLY-oracled recall grade for the
MinHash-LSH near-dup path (the ann_recall_eval recipe applied to the
dedup family, whose ``dedup_minhash`` key is rows-only by honest
annotation: xxhash64 signatures have no DuckDB twin). Planted
construction on ``documents``:

- PLANTED CORPUS: every document's text is replaced by its group
  anchor's text (groups of ``_MR_K = 5`` consecutive doc_ids, the
  image_phash_dedup doc_id-arithmetic recipe). Identical texts →
  identical shingle sets → identical 32-perm signatures → EVERY band
  collides, so the banded LSH join provably emits every within-group
  pair regardless of hash values, Arrow batching, or band layout —
  and the estimated Jaccard for those pairs is exactly 32/32 = 1.0.
- The eval calls ``minhash_candidates(collapse_exact=False)``: the
  production default collapses exact-duplicate content first (those
  groups are dedup_exact's output), which would hide precisely the
  pairs this grade plants. The raw-pair path exercises the
  signature/banding/join plumbing end to end.
- OUTPUT is filtered to within-group pairs (cross-group collisions —
  e.g. two groups planted from duplicate source texts — are real LSH
  output but not deterministic), so every row is pure doc_id
  arithmetic the oracle states: n_pairs = C(5,2) = 10 per eligible
  group, Σ(a+b) over the 10 pairs = 4·Σids = 100·gid + 40, and
  min/max estimated Jaccard = 1.0.
- ELIGIBILITY: a group emits rows iff it is complete (5 members) and
  its anchor text is NOT NULL. NULL-anchor groups are excluded from
  the planted corpus UP FRONT (the exact_duplicates rule: absent
  content is not duplicate content) — this must be an explicit
  filter, not an assumption about the shingler: word_shingles'
  short-doc fallback turns even a NULL text into the single empty
  shingle (``concat_ws`` skips NULLs), so an unfiltered NULL-anchor
  group WOULD collide and emit pairs. Any non-NULL text (even empty)
  likewise yields ≥ 1 shingle, so every retained group provably
  signs. The oracle states exactly that predicate.

Any regression in minhash_signatures (permutation layout, 32-bit
mask, shingle normalization), the band hashing, the pair join, or
the pair-dedup aggregation changes n_pairs / pair_id_sum / the
estimates and fails the hash. The statistical recall/precision
behavior on non-planted near-dups stays pinned in tests/test_lsh.py
(approximate by design).

Scale shape: one gid equi-join builds the planted corpus (hash join,
no corpus-sized broadcast), then the standard banded-LSH pipeline —
its only shuffle is the wide band-key join; within-group collision
buckets are 5 rows by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_MR_K = 5  # planted group size in doc_id units


def minhash_recall_over(docs: DataFrame) -> DataFrame:
    """The planted-construction grade over any (doc_id, text) frame —
    factored out so the NULL-anchor exclusion is pinned on a
    synthetic frame in tests (the real corpus currently has no NULL
    texts, which would otherwise leave that branch unproven)."""
    from stock_data_project_spark.operators.dedup import minhash_candidates

    members = docs.select("doc_id", F.expr(f"doc_id DIV {_MR_K}").alias("gid"))
    anchors = docs.filter(F.col("doc_id") % _MR_K == 0).select(
        F.expr(f"doc_id DIV {_MR_K}").alias("gid"),
        F.col("text").alias("a_text"),
    )
    # complete groups only — robust to a corpus tail that isn't a
    # multiple of the group size (the current testdata always is)
    full = (
        members.groupBy("gid").count().filter(F.col("count") == _MR_K).select("gid")
    )
    planted = (
        members.join(full, "gid")
        .join(anchors, "gid")
        # NULL-anchor groups out up front (module doc: the shingler's
        # whole-text fallback would otherwise sign even NULL texts)
        .filter(F.col("a_text").isNotNull())
        .select("doc_id", F.col("a_text").alias("text"))
    )
    pairs = minhash_candidates(planted, collapse_exact=False)
    same_g = pairs.filter(
        F.expr(f"doc_id_a DIV {_MR_K}") == F.expr(f"doc_id_b DIV {_MR_K}")
    )
    return same_g.groupBy(
        F.expr(f"doc_id_a DIV {_MR_K}").alias("gid")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("doc_id_a") + F.col("doc_id_b")).alias("pair_id_sum"),
        F.min("est_jaccard").alias("min_est"),
        F.max("est_jaccard").alias("max_est"),
    )


def q_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_recall_over(docs)


QUERIES_NEXT = {"minhash_recall_eval": q_minhash_recall_eval}

ORACLE_NEXT = {
    # the planted arithmetic (module doc): every eligible group emits
    # exactly the C(5,2)=10 within-group pairs with estimate 1.0 and
    # pair-id sum 4·(25·gid+10) = 100·gid+40. Eligible = complete
    # group AND anchor text IS NOT NULL. Decimal-literal trap: 1.0
    # parses as DECIMAL in DuckDB — CAST to DOUBLE to match Spark's
    # rounded-double estimates.
    "minhash_recall_eval": f"""
        WITH g AS (
            SELECT CAST(doc_id AS BIGINT) // {_MR_K} AS gid,
                   bool_or(doc_id % {_MR_K} = 0 AND text IS NOT NULL)
                       AS anchor_ok
            FROM documents
            GROUP BY 1
            HAVING count(*) = {_MR_K}
        )
        SELECT gid,
               CAST({_MR_K * (_MR_K - 1) // 2} AS BIGINT) AS n_pairs,
               CAST({_MR_K - 1} * ({_MR_K} * {_MR_K} * gid
                    + {_MR_K * (_MR_K - 1) // 2}) AS BIGINT) AS pair_id_sum,
               CAST(1.0 AS DOUBLE) AS min_est,
               CAST(1.0 AS DOUBLE) AS max_est
        FROM g WHERE anchor_ok
    """,
}
