"""LLM-data-pipeline key built in r10 (late batch), staged for the
r12 window.

``dsir_importance`` — Data Selection via Importance Resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): per-document log importance weight of a TARGET
distribution (here the English sub-corpus — the published recipe's
"formal text" target, instantiated on this corpus's lang column)
against the RAW distribution (the full corpus), under add-1-smoothed
unigram bag-of-words features:

    log w(doc) = Σ_tok c_doc(tok) · [ ln p_tgt(tok) − ln p_raw(tok) ]
    p_D(tok)   = (c_D(tok) + 1) / (T_D + V)

(The paper's production variant hashes n-grams into buckets; the
word-level variant keeps the estimator exactly and stays fully
oracle-able — the hashed variant would be engine-private xxhash,
the rows-only class.)

Cross-engine exactness: the per-token weight is a double ln-ratio of
EXACT integers with the identical expression shape on both engines
(the unigram_logprob precedent), rounded HALF-even to 6dp and cast to
DECIMAL(18,6); the per-doc reduction Σ c·w is then an exact DECIMAL
sum — order-independent, immune to partition layout — and only the
final cast returns to DOUBLE. Token counts c ≤ 1e10 by cast width;
weights bounded by ln(T+V) ≈ 12 on this corpus.

Scale shape: one explode → (doc, tok) hash agg (map-side partial),
one token-keyed vocab agg, the 1-row totals broadcast (the
whitelisted scalar-bind class), and a broadcast vocab join back to
the doc-term stream (fine until ~10⁸ distinct tokens; at web-scale
vocab drop the hint and let AQE run the hash join — the
unigram_logprob note applies verbatim). NULL-text docs are excluded
(no features, no weight) identically on both engines.

``vocab_growth`` — the Heaps-law curve of the corpus: per doc (in
doc_id ingestion order) the count of NEVER-BEFORE-SEEN tokens and
the running vocabulary size, plus the running token total (the
Heaps x-axis). The cumulative_distinct_users trick applied to
tokens: each token's first-seen doc (one token-keyed hash agg with
min(doc_id)) turns "cumulative distinct vocabulary" into a running
sum of per-doc first-seen counts — the incremental formulation that
holds at 100 TB, where a naive expanding COUNT(DISTINCT token)
rescans the corpus per step. The only window runs over the post-agg
PER-DOC table (corpus-count-sized, the calendar-sized class), never
the token stream. All-BIGINT exact; docs whose tokens were all seen
before get 0 via a left join + coalesce.

"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.textops import words

_TGT_LANG = "en"


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        (F.col("lang") == _TGT_LANG).alias("is_tgt"),
        F.explode(words("text")).alias("tok"),
    )
    # dt feeds the vocab rollup AND the doc-scoring join; vocab feeds
    # the totals AND the weight projection — without materialization
    # the tokenize ran three times (r13 before-plan, 6 scans)
    dt = (
        toks.groupBy("doc_id", "is_tgt", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = dt.groupBy("tok").agg(
        F.sum("c").alias("c_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("c")).otherwise(F.lit(0))).alias("c_tgt"),
    ).localCheckpoint(eager=True)
    totals = vocab.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    weighted = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.expr(
            "CAST(round("
            " ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(t_tgt + v AS DOUBLE))"
            " - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(t_raw + v AS DOUBLE)), 6)"
            " AS DECIMAL(18,6))"
        ).alias("w"),
    )
    return (
        dt.join(F.broadcast(weighted), "tok")
        .groupBy("doc_id")
        .agg(
            F.max(F.col("is_tgt").cast("int")).alias("is_target"),
            F.sum("c").alias("n_tokens"),
            F.sum(F.expr("CAST(c AS DECIMAL(10,0)) * w"))
            .cast("double")
            .alias("log_importance"),
        )
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # toks feeds per-doc counts AND first-seen election; a
    # materialization was TRIED in r13 and measured a net LOSS
    # (storing the exploded token rows costs more than the second
    # tokenize pass — explode is cheap to recompute, large to store),
    # so the duplicate scan deliberately stays
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new_tokens"))
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_doc.join(first_seen, "doc_id", "left")
        .withColumn("n_new_tokens", F.coalesce("n_new_tokens", F.lit(0)))
        .withColumn("tokens_seen", F.sum("n_tokens").over(w))
        .withColumn("vocab_size", F.sum("n_new_tokens").over(w))
    )


QUERIES_NEXT = {
    "dsir_importance": q_dsir_importance,
    "vocab_growth": q_vocab_growth,
}

ORACLE_NEXT = {
    "dsir_importance": rf"""
        WITH toks AS (
            SELECT doc_id, lang = '{_TGT_LANG}' AS is_tgt,
                   unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   )) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        dt AS (
            SELECT doc_id, is_tgt, tok, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY doc_id, is_tgt, tok
        ),
        vocab AS (
            SELECT tok,
                   CAST(sum(c) AS BIGINT) AS c_raw,
                   CAST(sum(CASE WHEN is_tgt THEN c ELSE 0 END) AS BIGINT) AS c_tgt
            FROM dt GROUP BY tok
        ),
        totals AS (
            SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
                   CAST(sum(c_tgt) AS BIGINT) AS t_tgt,
                   CAST(count(*) AS BIGINT) AS v
            FROM vocab
        ),
        weighted AS (
            SELECT tok,
                   CAST(round(
                       ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(t_tgt + v AS DOUBLE))
                     - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(t_raw + v AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) AS w
            FROM vocab CROSS JOIN totals
        )
        SELECT doc_id,
               CAST(max(CAST(is_tgt AS INT)) AS INT) AS is_target,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(c AS DECIMAL(10,0)) * w) AS DOUBLE) AS log_importance
        FROM dt JOIN weighted USING (tok)
        GROUP BY doc_id
    """,
    "vocab_growth": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   )) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
            FROM toks GROUP BY doc_id
        ),
        first_seen AS (
            SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_new_tokens
            FROM (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok)
            GROUP BY first_doc
        )
        SELECT p.doc_id, p.n_tokens,
               coalesce(f.n_new_tokens, 0) AS n_new_tokens,
               CAST(sum(p.n_tokens) OVER w AS BIGINT) AS tokens_seen,
               CAST(sum(coalesce(f.n_new_tokens, 0)) OVER w AS BIGINT)
                   AS vocab_size
        FROM per_doc p LEFT JOIN first_seen f ON p.doc_id = f.doc_id
        WINDOW w AS (ORDER BY p.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
}
