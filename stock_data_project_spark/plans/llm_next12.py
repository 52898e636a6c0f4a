"""LLM-data-pipeline keys built late in r10, staged for the r12
window — corpus-statistics and sub-document-dedup seams.

``zipf_slope`` — the Zipf-law fit per source: OLS of ln(frequency)
on ln(rank) over each source's top-100 tokens (rank = row_number
over (count DESC, token ASC) — fully deterministic tie order on
both engines). The Heaps-law companion to vocab_growth: together
they are the two classical corpus-health diagnostics a pretraining
mix report carries. Exactness: ln of exact BIGINTs is rounded
HALF-even to 6dp and cast to DECIMAL(12,6) (the unigram_logprob /
dsir precedent — the rounding absorbs sub-1e-6 libm drift), the
four OLS sums are exact decimal aggregates, and slope/intercept
evaluate in ONE shared double-expression string. Scale shape: one
explode → (source, token) hash agg with map-side partials, a
per-source top-k window over the POST-AGG table (vocab-sized, never
the token stream), then a 20-row result.

``flesch_reading_ease`` — the classical readability score per doc:
FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
with sentences = [.!?]+ runs, words = [a-z]+ runs of the lowercased
text, syllables = [aeiouy]+ vowel groups (the standard dictionary-
free approximation; vowel runs never span whitespace, so the
doc-level count equals the per-word sum without any tokenization).
All three counts are exact regexp-match counts (RE2 class syntax,
identical both engines, CAST to INT per the DuckDB len() rule);
the score is one shared double expression over exact INTs with
nullif guards (0 sentences / 0 words → NULL). Row-local per the
collection-expr rule: ONE shuffle-free scan, no explode, no joins.

``containment_pairs`` — asymmetric word-set containment over the
same (lang, len-bucket) blocked candidate pairs as ngram_jaccard:
|A∩B|/|A| and |A∩B|/|B|, emitted when either direction ≥ 0.5. The
sub-document-duplication detector Jaccard structurally misses (a doc
wholly embedded in a 10× larger one scores jaccard ~0.1 but
containment 1.0 — the Lee et al. dedup-gap class). Spark side reuses
the blocked incidence-matrix GEMM (operators/dedup.py
blocked_containment_pairs — same M·Mᵀ as jaccard, different
normalizer); oracle is the per-pair list_intersect ratio. Blocked →
never all-pairs; one shuffle on the block key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.dedup import blocked_containment_pairs
from stock_data_project_spark.operators.textops import words

_ZIPF_TOPK = 100
_CONT_THRESHOLD = 0.5

# shared double-expression strings (both engines; no bare-literal ×
# integer chains — the decimal-literal parse trap)
_ZIPF_SLOPE = (
    "((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))"
)
_ZIPF_INTERCEPT = (
    f"((CAST(sy AS DOUBLE) - {_ZIPF_SLOPE} * CAST(sx AS DOUBLE))"
    f" / CAST(n_terms AS DOUBLE))"
)

_FRE = (
    "(206.835"
    " - 1.015 * (CAST(n_words AS DOUBLE) / nullif(CAST(n_sentences AS DOUBLE), 0.0))"
    " - 84.6 * (CAST(n_syllables AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0)))"
)


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cnt = (
        docs.select("source", F.explode(words("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    ranked = cnt.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _ZIPF_TOPK
    )
    vals = ranked.select(
        "source",
        F.expr("CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(12,6))").alias("x"),
        F.expr("CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(12,6))").alias("y"),
    )
    g = vals.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return g.select(
        "source",
        "n_terms",
        (F.round(F.expr(_ZIPF_SLOPE), 6) + 0.0).alias("zipf_slope"),
        (F.round(F.expr(_ZIPF_INTERCEPT), 6) + 0.0).alias("zipf_intercept"),
    )


def q_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counted = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))).alias(
            "n_sentences"
        ),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
        ).alias("n_words"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ).alias("n_syllables"),
    )
    return counted.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        (F.round(F.expr(_FRE), 6) + 0.0).alias("flesch"),
    )


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocked_containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=_CONT_THRESHOLD
    )


QUERIES_NEXT = {
    "zipf_slope": q_zipf_slope,
    "flesch_reading_ease": q_flesch_reading_ease,
    "containment_pairs": q_containment_pairs,
}

# SQL fragments shared with operators/textops.py (keep in sync).
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_WORDS = f"string_split({_NORM}, ' ')"

ORACLE_NEXT = {
    "zipf_slope": f"""
        WITH toks AS (
            SELECT source, unnest({_WORDS}) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        cnt AS (
            SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        ranked AS (
            SELECT source, c,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, tok ASC) AS rank
            FROM cnt QUALIFY rank <= {_ZIPF_TOPK}
        ),
        vals AS (
            SELECT source,
                   CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
                   CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
            FROM ranked
        ),
        g AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                   sum(x) AS sx, sum(y) AS sy,
                   -- ≥19-digit operands: DuckDB's int64 multiply tier
                   -- can overflow on (12,6)² at |x| ~1e3; int128 is exact
                   sum(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS sxy,
                   sum(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS sxx
            FROM vals GROUP BY 1
        )
        SELECT source, n_terms,
               round({_ZIPF_SLOPE}, 6) + 0.0 AS zipf_slope,
               round({_ZIPF_INTERCEPT}, 6) + 0.0 AS zipf_intercept
        FROM g
    """,
    "flesch_reading_ease": f"""
        WITH counted AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[.!?]+')) AS INT)
                       AS n_sentences,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT)
                       AS n_words,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT)
                       AS n_syllables
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, n_sentences, n_words, n_syllables,
               round({_FRE}, 6) + 0.0 AS flesch
        FROM counted
    """,
    "containment_pairs": f"""
        WITH docs AS (
            SELECT doc_id, lang,
                   CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
                   list_distinct({_WORDS}) AS wordset
            FROM documents
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                     / len(a.wordset), 6) AS containment_a,
               round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                     / len(b.wordset), 6) AS containment_b
        FROM docs a JOIN docs b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE greatest(
                round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                      / len(a.wordset), 6),
                round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                      / len(b.wordset), 6)) >= {_CONT_THRESHOLD}
    """,
}
