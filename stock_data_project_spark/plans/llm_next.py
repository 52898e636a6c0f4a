"""LLM-pipeline keys staged for the r5 driver window.

The r4 correctness window is exactly full (50 keys: the two fixed IVF
keys, the eight TPC-H debuts, stream_ingest_dedup, and the 39 stale
re-grades), so these eight debut in r5 — registered-but-ungraded keys
are the defect the r2 verdict flagged on wilder_rsi. They are
parity-proven NOW by tests/test_llm_next.py (the driver-identical
value comparison; ann_pq/ann_ivfpq rows-only, semantics pinned in
tests/test_pq.py and tests/test_ivfpq.py) and flip into
``plans/llm.py`` + the r5 ``_GRADE_ORDER`` head next round.

The eight close the remaining training-data-pipeline surface
(dup_span_coverage, ann_pq, ann_ivfpq are documented on their
builders below):
- ``pii_scrub`` — redaction gate (codegen regexp chain, zero shuffle);
- ``line_dedup`` — CCNet/RefinedWeb cross-corpus boilerplate-line
  removal (two uniform-key shuffles);
- ``dedup_clusters`` — transitive closure over near-dup pairs
  (large-star/small-star, O(log n) rounds), the step that turns pair
  output into per-cluster keeper assignment. Its oracle is a WITH
  RECURSIVE label-propagation CTE — fine for DuckDB at sf0.01, while
  the Spark side uses the bounded-round star algorithm that survives
  100 TB edge lists.
- ``unigram_logprob`` — CCNet-style LM quality signal without a
  model: per-doc mean log-probability under the corpus's own unigram
  distribution (the stand-in for "wikipedia perplexity" filtering);
- ``near_dup_removal`` — the dedup pipeline closed end-to-end:
  jaccard pairs → connected components → min-id keeper per cluster →
  surviving corpus with cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.dedup import (
    blocked_jaccard_pairs,
    dedup_clusters,
    line_dedup,
)
from stock_data_project_spark.operators.textops import pii_counts, pii_scrub, words

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
_PHONE = r"\+?[0-9][0-9 ().-]{8,}[0-9]"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction gate over the corpus: masked text + per-category
    counts. The corpus is PII-free word soup, so the gate proves
    clean-text passthrough here; masking exactness is pinned on
    planted PII in tests/test_textops_pii.py."""
    docs = load_table(spark, sf_dir, "documents")
    counts = pii_counts("text")
    return docs.select(
        "doc_id",
        pii_scrub("text").alias("clean_text"),
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ips"),
        counts["phone"].alias("n_phones"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus repeated-line removal. Single-line corpus texts
    make this the exact-dup degenerate case (dup-text docs empty
    out); multi-line semantics are pinned in tests/test_textops_pii.py."""
    docs = load_table(spark, sf_dir, "documents")
    return line_dedup(docs).select(
        "doc_id", "text", "n_lines_kept", "n_lines_dropped"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters = connected components over the
    blocked-jaccard pair graph (same pair source as the
    ``ngram_jaccard`` key, threshold 0.4)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters(blocked_jaccard_pairs(docs))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean log-prob under the corpus unigram LM — the
    model-free stand-in for CCNet's perplexity bucketing (docs whose
    tokens are globally rare score low and get routed to the tail
    bucket).

    Plan shape and the web-scale vocab note live on the shared
    implementation, ``textops.unigram_logprob_scores`` (one scorer
    for this plan and the corpus builder's min_logprob gate)."""
    from stock_data_project_spark.operators.textops import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs)


def q_near_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup pipeline end-to-end: blocked jaccard pairs →
    connected components → keeper = min doc_id per cluster → the
    surviving corpus with its duplicate multiplicity. Singleton docs
    (no near-dup) survive with cluster_size 1."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(blocked_jaccard_pairs(docs))
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    kept_clustered = sizes.select(
        F.col("cluster_id").alias("doc_id"), "cluster_size"
    )
    singletons = docs.join(
        clusters, docs.doc_id == clusters.member_id, "left_anti"
    ).select("doc_id", F.lit(1).cast("bigint").alias("cluster_size"))
    return kept_clustered.unionByName(singletons)


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators/pq.py): fit per-subspace
    codebooks, encode the corpus to m-byte codes, search by
    asymmetric distance over the CODES — the 32× scan-volume
    compression path. Rows-only (approximate by design; recall vs
    the exact brute force is asserted in tests/test_pq.py)."""
    from stock_data_project_spark.operators.memo import session_memo
    from stock_data_project_spark.operators.pq import pq_encode, pq_fit, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # immutable sf_dir → identical codebook every invocation; memoize
    # the kilobyte codebook table so steady-state searches skip the
    # fit job (operators/memo.py, the bloom-bitmap pattern)
    codebook = session_memo(
        spark, ("pq_codebook", sf_dir, 16, 6), lambda: pq_fit(emb, m=16, nbits=6)
    )
    codes = pq_encode(emb, codebook, drop_vec=True)
    return pq_topk(codes, codebook, queries, k=5, rerank=50, vectors=emb)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed ANN (operators/ivfpq.py): cell routing bounds
    the rows scanned, PQ codes bound the bytes per row, exact re-rank
    absorbs quantization noise — the full FAISS IndexIVFPQ recipe.
    Rows-only (approximate; recall floors + the nprobe=n_cells
    equivalence limit are pinned in tests/test_ivfpq.py)."""
    from stock_data_project_spark.operators.ivfpq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_topk(emb, queries, k=5, m=16, nbits=6, rerank=50)


def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-span coverage — the shingle
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    doc, the fraction of its distinct 8-word shingles that appear in
    at least one OTHER document. High coverage = the doc is largely
    assembled from corpus-repeated spans even when no single whole
    near-duplicate exists (the case minhash/jaccard doc-level dedup
    misses). Docs shorter than 8 words contribute their whole text
    as one shingle (word_shingles' documented fallback).

    Shuffles: shingle count groupBy + the count join + the per-doc
    agg — all on uniform hash keys (shingle text / doc_id); no
    all-pairs anywhere, cost linear in total shingle volume."""
    from stock_data_project_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # r8: shingles via window-lead CODEGEN (shingle_rows) — the
    # interpreted zip_with construction measured 11.8× slower at the
    # 30× smoke on the 8-gram novelty scan; bit-identical rows
    sh = shingle_rows(docs, 8)
    counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = (F.col("n_docs") > 1).cast("bigint")
    return (
        sh.join(counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(dup).alias("n_dup"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_fraction"),
        )
    )


QUERIES_NEXT = {
    "pii_scrub": q_pii_scrub,
    "line_dedup": q_line_dedup,
    "dedup_clusters": q_dedup_clusters,
    "unigram_logprob": q_unigram_logprob,
    "near_dup_removal": q_near_dup_removal,
    "ann_pq": q_ann_pq,
    "ann_ivfpq": q_ann_ivfpq,
    "dup_span_coverage": q_dup_span_coverage,
}

# the scrub is sequential (emails masked before the phone pattern
# runs — an IPv4/phone would double-count otherwise), so each count
# stage reads the previous stage's text, exactly like pii_counts
ORACLE_NEXT = {
    "pii_scrub": f"""
        WITH s0 AS (
            SELECT doc_id, text,
                   CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INT) AS n_emails,
                   regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS t1
            FROM documents
        ), s1 AS (
            SELECT doc_id, n_emails,
                   CAST(len(regexp_extract_all(t1, '{_IP}')) AS INT) AS n_ips,
                   regexp_replace(t1, '{_IP}', '<IP>', 'g') AS t2
            FROM s0
        )
        SELECT doc_id,
               regexp_replace(t2, '{_PHONE}', '<PHONE>', 'g') AS clean_text,
               n_emails, n_ips,
               CAST(len(regexp_extract_all(t2, '{_PHONE}')) AS INT) AS n_phones
        FROM s1
    """,
    "line_dedup": r"""
        WITH exploded AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   generate_subscripts(string_split(text, chr(10)), 1) AS pos
            FROM documents WHERE text IS NOT NULL
        ), lines AS (
            SELECT doc_id, line, pos,
                   md5(regexp_replace(lower(trim(line)), '\s+', ' ', 'g')) AS h,
                   len(trim(line)) >= 1 AS big
            FROM exploded
        ), banned AS (
            SELECT h FROM lines WHERE big
            GROUP BY h HAVING count(DISTINCT doc_id) > 1
        ), marked AS (
            SELECT l.doc_id, l.pos, l.line,
                   (b.h IS NOT NULL AND l.big) AS dropped
            FROM lines l LEFT JOIN banned b USING (h)
        ), rebuilt AS (
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
                                       chr(10) ORDER BY pos), '') AS new_text,
                   sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS n_kept,
                   sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS n_dropped
            FROM marked GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(r.new_text, '') AS text,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
               CAST(coalesce(r.n_dropped, 0) AS BIGINT) AS n_lines_dropped
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
    "dedup_clusters": r"""
        WITH RECURSIVE docs AS (
            SELECT doc_id, lang,
                   CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
                   list_distinct(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   )) AS wordset
            FROM documents
        ), edges0 AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.wordset, b.wordset))),
                        6) >= 0.4
        ), edges AS (
            SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0
        ), reach(node, label) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
        )
        SELECT node AS member_id, min(label) AS cluster_id
        FROM reach GROUP BY node
    """,
    "unigram_logprob": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   )) AS tok
            FROM documents WHERE text IS NOT NULL
        ), freq AS (
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ), tot AS (
            SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(ln(CAST(c AS DOUBLE) / t)), 6) AS avg_logprob
        FROM toks JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    """,
    # same recursive-CTE component labeling as dedup_clusters, then
    # keeper = min doc_id (== cluster_id) and singleton passthrough
    "near_dup_removal": r"""
        WITH RECURSIVE docs AS (
            SELECT doc_id, lang,
                   CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
                   list_distinct(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
                   )) AS wordset
            FROM documents
        ), edges0 AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.wordset, b.wordset)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.wordset, b.wordset))),
                        6) >= 0.4
        ), edges AS (
            SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0
        ), reach(node, label) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
        ), comp AS (
            SELECT node AS member_id, min(label) AS cluster_id
            FROM reach GROUP BY node
        ), sizes AS (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY cluster_id
        )
        SELECT d.doc_id,
               CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size
        FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.member_id
        LEFT JOIN sizes s ON c.cluster_id = s.cluster_id
        WHERE c.member_id IS NULL OR c.member_id = c.cluster_id
    """,
    # mirrors word_shingles exactly: space-joined normalized words,
    # 8-gram windows, whole-text fallback for docs under 8 words
    "dup_span_coverage": r"""
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
        ), cnt AS (
            SELECT sh, count(*) AS n_docs FROM sh GROUP BY sh
        )
        SELECT doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS dup_fraction
        FROM sh JOIN cnt USING (sh)
        GROUP BY doc_id
    """,
}
