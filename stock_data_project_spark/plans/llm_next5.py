"""LLM-pipeline keys built in r8, staged for the r9 driver window.

- ``token_entropy`` — per-document Shannon entropy of the word
  distribution (the repetitive/templated-text quality signal used
  alongside the Gopher gates: near-zero entropy = boilerplate).
  H = ln(n) − (Σ c·ln c)/n over per-word counts c. Per the repo
  explode rule, the per-token work FEEDS an aggregation, so it runs
  as explode + codegen groupBy (two uniform-key shuffles: (doc,
  word) then doc), never an interpreted HOF fold. Rounded 6dp both
  engines.

- ``ann_range_search`` — radius similarity search: all corpus
  vectors with cosine ≥ τ of each query (operators/similarity.
  cosine_range). The companion to ann_cosine_topk: retrieval wants
  top-k, dedup/recall audits want "all above τ". One map-side GEMM
  scan, NO ranking shuffle; output bounded by the true match count.
  Fully oracled: sims round to 6dp BEFORE the threshold on both
  engines.

- ``quality_percentile_gate`` — per-source quality curation (the
  FineWeb-style per-domain percentile threshold, not one global
  cut): percent_rank over (quality_score, doc_id) within each
  source, keep the top 30%, report per-source kept counts and score
  stats. percent_rank is exact rational arithmetic — identical in
  both engines — and the (score, doc_id) order is total, so the
  gate decision is deterministic row-by-row.

Reference parity: the reference has no text pipeline (its scope is
price ingest, fetch_stocks.py); this family is the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.textops import (
    STOPWORDS,
    normalized,
    with_quality,
    words,
)

_RANGE_TAU = 0.3
_GATE_KEEP_FRAC = 0.3  # keep the top 30% per source
_BM25_TERMS = ("hash", "join", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words()).alias("word")
    )
    per_word = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
                "_clnc"
            ),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            F.round(
                F.log(F.col("n_words").cast("double"))
                - F.col("_clnc") / F.col("n_words"),
                6,
            ).alias("entropy"),
        )
    )


def q_ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.plans.llm import N_QUERY_VECS
    from stock_data_project_spark.operators.similarity import cosine_range

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return cosine_range(emb, queries, tau=_RANGE_TAU)


def q_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = with_quality(docs).filter(F.col("quality_score").isNotNull())
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    gated = scored.withColumn("pr", F.percent_rank().over(w)).withColumn(
        "kept", F.col("pr") >= F.lit(1.0 - _GATE_KEEP_FRAC)
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.round(
            F.avg(F.when(F.col("kept"), F.col("quality_score"))), 6
        ).alias("avg_kept_score"),
        F.round(
            F.min(F.when(F.col("kept"), F.col("quality_score"))), 6
        ).alias("gate_threshold"),
    )


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking of the corpus for a fixed conjunctive
    query (Robertson et al.; the Lucene-flavored idf
    ln((N−df+0.5)/(df+0.5)+1), k1=1.2, b=0.75) — the classic sparse
    retrieval scorer next to the dense ANN family. Shape: explode →
    per-(doc, term) tf filtered to the query terms (a broadcast-able
    3-row dimension), doc lengths from one codegen scan, corpus
    stats (N, avgdl) as a 1-row broadcast bind; top-N via
    orderBy+limit = TakeOrderedAndProject, never a global sort.
    Fully oracled: every factor is deterministic arithmetic, the
    per-doc score sums ≤ |terms| values, rounded 6dp both engines."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select("doc_id", F.size(words()).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(words()).alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(lens), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_TOPN)
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int"))


def q_doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib-compressibility quality signal (rows-only: DuckDB has no
    deflate; determinism + known-plaintext ratios pinned in-repo):
    highly compressible text is repetitive/templated — the cheap
    byte-level cousin of token_entropy. Map-only Arrow-batched scan,
    scalar output columns; zlib level fixed so the ratio is
    bit-deterministic across runs and partitionings."""
    import zlib

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(batches):
        for pdf in batches:
            ratios, nb, nc = [], [], []
            for t in pdf["text"]:
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, 6)
                nb.append(len(raw))
                nc.append(len(comp))
                ratios.append(
                    round(len(comp) / len(raw), 6) if raw else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(nb, dtype="Int64"),
                    "n_compressed": pd.array(nc, dtype="Int64"),
                    "compression_ratio": pd.array(ratios, dtype="float64"),
                }
            )

    return docs.mapInPandas(
        kernel,
        "doc_id long, n_bytes long, n_compressed long, compression_ratio double",
    )


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram NOVELTY — the directional complement of
    dup_span_coverage: the fraction of a doc's distinct 8-word
    shingles that it INTRODUCES to the corpus (min doc_id over the
    shingle == this doc, in doc_id order). Low novelty late in the
    corpus = the doc re-assembles already-seen spans — the
    memorization/recency audit a dedup pass reads alongside span
    coverage. Short docs contribute their whole text as one shingle
    (word_shingles' fallback).

    Plan shape — JOIN-FREE on the shingle key AND codegen shingle
    construction: the numerator collapses to groupBy(sh).min(doc_id)
    → groupBy(min_doc).count() (each shingle is novel for exactly ONE
    doc, so no join back on the long-string shingle key), and the
    shingles come from operators/dedup.shingle_rows — window-lead
    codegen, not interpreted zip_with. Measured at the 30× smoke:
    first cut (HOF + string join) 74.7s → join-free HOF 66.6s →
    this shape 5.7s, bit-identical output at every step."""
    from stock_data_project_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    sh = shingle_rows(docs, 8)
    per_doc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    firsts = (
        sh.groupBy("sh")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        per_doc.join(firsts, "doc_id", "left")
        .withColumn("n_novel", F.coalesce("n_novel", F.lit(0)))
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") * 1.0 / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


QUERIES_NEXT = {
    "token_entropy": q_token_entropy,
    "ann_range_search": q_ann_range_search,
    "quality_percentile_gate": q_quality_percentile_gate,
    "bm25_rank": q_bm25_rank,
    "doc_compression_ratio": q_doc_compression_ratio,
    "ngram_novelty": q_ngram_novelty,
}

# SQL twins — the same normalization/scoring fragments as llm.py's
# oracles (string-level identical normalization is what keeps the
# tokenizations in lockstep)
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_WORDS = f"string_split({_NORM}, ' ')"


def _sql_list(xs: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"

ORACLE_NEXT = {
    "bm25_rank": f"""
        WITH lens AS (
            SELECT doc_id, CAST(len({_WORDS}) AS INT) AS dl FROM documents
        ),
        stats AS (
            SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
            FROM lens
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest({_WORDS}) AS term FROM documents)
            WHERE term IN (SELECT unnest({_BM25_TERMS_SQL}))
            GROUP BY 1, 2
        ),
        dft AS (
            SELECT term, count(*) AS df FROM tf GROUP BY 1
        ),
        scored AS (
            SELECT t.doc_id,
                   round(sum(
                       ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * (t.tf * ({_BM25_K1} + 1.0))
                       / (t.tf + {_BM25_K1}
                          * (1.0 - {_BM25_B} + {_BM25_B} * l.dl / avgdl))
                   ), 6) AS bm25
            FROM tf t JOIN dft USING (term)
                      JOIN lens l ON t.doc_id = l.doc_id
                      CROSS JOIN stats
            GROUP BY 1
        ),
        top AS (
            SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPN}
        )
        SELECT doc_id, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
                   AS rank
        FROM top
    """,
    "token_entropy": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_WORDS}) AS word FROM documents
        ),
        per_word AS (
            SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               count(*) AS n_distinct,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       / sum(c), 6) AS entropy
        FROM per_word
        GROUP BY doc_id
    """,
    "ann_range_search": f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 10
        ),
        e AS (
            SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
            FROM embeddings
        )
        SELECT query_id, neighbor_id,
               round(list_cosine_similarity(qv, nv), 6) AS cosine_sim
        FROM e CROSS JOIN q
        WHERE neighbor_id <> query_id
          AND round(list_cosine_similarity(qv, nv), 6) >= {_RANGE_TAU}
    """,
    # the dup_span_coverage shingle CTE with min-doc firsts
    "ngram_novelty": r"""
        WITH norm AS (
            SELECT doc_id,
                   string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   ) AS w
            FROM documents WHERE text IS NOT NULL
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, gs.i, gs.i + 7), ' ') AS sh
            FROM norm, LATERAL unnest(generate_series(1, len(w) - 7)) AS gs(i)
            WHERE len(w) >= 8
            UNION
            SELECT DISTINCT doc_id, array_to_string(w, ' ') AS sh
            FROM norm WHERE len(w) < 8
        ), per_doc AS (
            SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), firsts AS (
            SELECT min(doc_id) AS doc_id FROM sh GROUP BY sh
        ), novel AS (
            SELECT doc_id, count(*) AS n_novel FROM firsts GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_shingles,
               coalesce(n.n_novel, 0) AS n_novel,
               round(coalesce(n.n_novel, 0) * 1.0 / p.n_shingles, 6)
                   AS novelty
        FROM per_doc p LEFT JOIN novel n USING (doc_id)
    """,
    "quality_percentile_gate": f"""
        WITH base AS (
            SELECT doc_id, source,
                   length(text) AS nc,
                   CAST(len({_WORDS}) AS INT) AS n_words,
                   length(regexp_replace(text, '[.,!?;:()\\-]', '', 'g'))
                       AS nc_nopunct,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS nc_alpha,
                   len(list_filter({_WORDS},
                       w -> list_contains({_sql_list(STOPWORDS["en"])}, w)))
                       AS n_stop
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source,
                   round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.25
                         + (CAST(nc_alpha AS DOUBLE) / nullif(nc, 0)) * 0.35
                         + least((CAST(n_stop AS DOUBLE) / n_words) * 5.0,
                                 1.0) * 0.25
                         + (1.0 - least((CAST(nc - nc_nopunct AS DOUBLE)
                                         / nullif(nc, 0)) * 10.0, 1.0)) * 0.15,
                         6) AS quality_score
            FROM base
        ),
        gated AS (
            SELECT source, quality_score,
                   percent_rank() OVER (PARTITION BY source
                                        ORDER BY quality_score, doc_id) AS pr
            FROM scored
            WHERE quality_score IS NOT NULL
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN pr >= {1.0 - _GATE_KEEP_FRAC}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               round(avg(CASE WHEN pr >= {1.0 - _GATE_KEEP_FRAC}
                              THEN quality_score END), 6) AS avg_kept_score,
               round(min(CASE WHEN pr >= {1.0 - _GATE_KEEP_FRAC}
                              THEN quality_score END), 6) AS gate_threshold
        FROM gated
        GROUP BY source
    """,
}
