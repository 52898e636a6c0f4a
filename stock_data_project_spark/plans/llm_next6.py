"""LLM-pipeline keys built in r8 for the r9 driver window.

- ``tfidf_retrieval`` — sparse TF-IDF cosine retrieval, fully
  oracled: query docs (every 100th doc_id) score against the corpus
  through a postings join on the shared token, with three
  determinism guards that keep a float pipeline hash-stable across
  engines: (1) every tf·idf weight is rounded to 6dp and cast to
  DECIMAL(18,6), (2) dot products and squared norms are DECIMAL
  sums of per-pair rounded products (summation-order-free — the q9
  rule), (3) ranking orders by the ROUNDED cosine with a doc_id
  tiebreak. Stopword-class terms (df·20 ≥ N·19, i.e. in ≥95% of
  docs) are dropped on both sides — the exact-integer form of the
  standard postings-fanout bound, and it guarantees idf > 0 so
  norms never vanish (no 0/0 cosine). The threshold is generous
  because the synthetic corpus has a ~31-term vocabulary with
  median df ≈ 78% of docs; a natural corpus would cap far lower.
  Complements ``bm25_rank`` (probabilistic weighting) with the
  classic vector-space model.

- ``embedding_dim_stats`` — per-dimension corpus statistics of the
  embedding column (the feature-whitening precursor): posexplode →
  one groupBy on dim (64 uniform keys). Sums and sums-of-squares
  aggregate in DECIMAL(18,6); mean/std come out of identical double
  expressions over the exact sums, so the key is fully oracled
  (DuckDB side zips parallel ``unnest(embedding)`` /
  ``unnest(range(len(...)))``). At 100 TB this is one
  map-side-combinable shuffle of 64 keys × partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.cache import checkpoint_release
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.operators.textops import words
from stock_data_project_spark.plans.llm import _NORM

_QUERY_MOD = 100  # doc_id % 100 == 0 -> query candidates
_QUERY_PANEL = 20  # fixed |Q|: the 20 smallest candidates
_TOPK = 5
# drop terms with df*20 >= N*19 (>= 95% of docs); also forces idf > 0
_DF_CAP_NUM, _DF_CAP_DEN = 20, 19


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf): one row per (doc, word) — the postings
    frame every tf-idf consumer hangs off."""
    return (
        docs.select("doc_id", F.explode(words("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _weights(docs: DataFrame, tf: DataFrame | None = None) -> DataFrame:
    """(doc_id, word, w_d): 6dp-rounded tf·idf as DECIMAL(18,6),
    stopword-class terms (df·20 ≥ N·19, i.e. in ≥95% of docs)
    dropped exactly.

    ``tf`` may be passed pre-built (e.g. persisted) so the tokenize
    pass is shared: the r13 before-plan showed the whole
    tokenize+groupBy subtree computed TWICE inside one weights
    materialization — df's branch prunes tf's count column, which
    makes the two exchanges canonically different, so ReuseExchange
    never fires (the distributed_ntile pruning class, join edition).
    df = count(*) over tf is exactly countDistinct(doc_id): tf has
    one row per (doc_id, word).

    INVARIANT (r13 ADVICE): a pre-built ``tf`` MUST come from this
    same ``docs`` frame — n_docs is counted over ``docs``, not tf,
    deliberately: a doc whose text tokenizes to zero words has no tf
    row but still counts in the idf denominator (deriving n_docs
    from tf would silently change idf for such corpora)."""
    n_docs = docs.select(F.countDistinct("doc_id").alias("_n"))
    if tf is None:
        tf = _tf(docs)
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * _DF_CAP_NUM < F.col("_n") * _DF_CAP_DEN)
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("_n").cast("double") / F.col("df")), 6
            )
            .cast("decimal(18,6)")
            .alias("w_d"),
        )
    )


def q_tfidf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.catalog import table_rows
    from stock_data_project_spark.plans.llm_next7 import _fan_out

    # tokenize+explode under-splits when the documents scan arrives
    # in few large row-groups (the packed-array class — observed as
    # a 100s-vs-10s smoke swing across replica writes); partitioning
    # can't change results here: every downstream agg is hash-keyed
    # and every float is decimal-summed (no range exchange to desync)
    docs = _fan_out(
        spark,
        load_table(spark, sf_dir, "documents"),
        rows_hint=table_rows(sf_dir, "documents"),
        rows_per_task=1024,  # tokenize+explode: codegen µs/row
    )
    # three consumers (norms, query side, corpus side) hang off the
    # tokenize+groupBy lineage — persist ONE materialization instead
    # of recomputing the explode per branch (10.5s → ~4s at sf0.1).
    # Hash exchanges are value-deterministic so recompute would be
    # CORRECT (unlike the range-exchange rule), just 3× the scan.
    # Released below via checkpoint_release — the top-k output is
    # |Q|·k rows, bounded (the r12-verdict persist-leak fix).
    # r13: persist tf AS WELL — persisting only w still ran the
    # tokenize TWICE inside the one w materialization (df's pruned
    # branch defeats ReuseExchange; see _weights). Persisting ONLY tf
    # and re-deriving w per consumer was measured WORSE (interleaved
    # A/B medians 7.2/5.9/4.8 vs 4.2/4.4/4.1 — three join+filter
    # re-derivations beat the one saved tokenize), so both frames
    # cache: 1 tokenize + w built once from cached tf + consumers on
    # cached w. persist, not checkpoint: the A/B on checkpointing
    # this size class regressed 3.56→5.25s (AQE coalesces the tiny
    # cached output to ~1 partition and the 15×-fanout postings join
    # goes serial).
    tf = _tf(docs).persist()
    w = _weights(docs, tf=tf).persist()
    # squared norms: decimal sums of per-term rounded squares
    wd = F.col("w_d").cast("double")
    norms = w.groupBy("doc_id").agg(
        F.sum(F.round(wd * wd, 6).cast("decimal(18,6)")).alias("nrm2_d")
    )
    # FIXED query panel: the 20 smallest candidate doc_ids
    # (orderBy+limit = TakeOrdered, metadata-sized at any corpus
    # size). A panel that SCALES with the corpus (doc_id % 100 == 0
    # alone) makes the postings join |corpus|²/100 on a shared-vocab
    # corpus — measured 1179s at the 30× smoke vs |Q|-bounded here.
    qids = (
        docs.filter(F.col("doc_id") % _QUERY_MOD == 0)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(_QUERY_PANEL)
    )
    qw = w.join(F.broadcast(qids), "doc_id").select(
        F.col("doc_id").alias("query_id"), "word", F.col("w_d").alias("qw_d")
    )
    dots = (
        # |Q| = docs/100 → query weights are a broadcast-able slice
        w.join(F.broadcast(qw), "word")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.round(
                    F.col("qw_d").cast("double") * F.col("w_d").cast("double"), 6
                ).cast("decimal(18,6)")
            ).alias("dot_d")
        )
    )
    qn = norms.select(F.col("doc_id").alias("query_id"), F.col("nrm2_d").alias("qn2"))
    cos = (
        dots.join(norms, "doc_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("dot_d").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("nrm2_d").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    rk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    out = (
        cos.withColumn("rank", F.row_number().over(rk).cast("int"))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "rank", "doc_id", "cosine")
    )
    return checkpoint_release(out, w, tf)


_TFIDF_SQL = f"""
    WITH tf AS (
        SELECT doc_id, word, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    w AS (
        SELECT doc_id, tf.word,
               CAST(round(tf * ln(CAST(n AS DOUBLE) / df), 6)
                    AS DECIMAL(18,6)) AS w_d
        FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n_docs
        WHERE df * {_DF_CAP_NUM} < n * {_DF_CAP_DEN}
    ), norms AS (
        SELECT doc_id,
               sum(CAST(round(CAST(w_d AS DOUBLE) * CAST(w_d AS DOUBLE), 6)
                        AS DECIMAL(18,6))) AS nrm2_d
        FROM w GROUP BY doc_id
    ), qids AS (
        SELECT doc_id FROM documents
        WHERE doc_id % {_QUERY_MOD} = 0
        ORDER BY doc_id LIMIT {_QUERY_PANEL}
    ), dots AS (
        SELECT q.doc_id AS query_id, d.doc_id,
               sum(CAST(round(CAST(q.w_d AS DOUBLE) * CAST(d.w_d AS DOUBLE), 6)
                        AS DECIMAL(18,6))) AS dot_d
        FROM w q JOIN w d ON q.word = d.word AND d.doc_id <> q.doc_id
        WHERE q.doc_id IN (SELECT doc_id FROM qids)
        GROUP BY 1, 2
    ), cos AS (
        SELECT query_id, dots.doc_id,
               round(CAST(dot_d AS DOUBLE)
                     / (sqrt(CAST(qn.nrm2_d AS DOUBLE))
                        * sqrt(CAST(dn.nrm2_d AS DOUBLE))), 6) AS cosine
        FROM dots
        JOIN norms dn ON dn.doc_id = dots.doc_id
        JOIN norms qn ON qn.doc_id = dots.query_id
    )
    SELECT query_id, rank, doc_id, cosine
    FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, doc_id ASC)
                       AS INT) AS rank
        FROM cos
    )
    WHERE rank <= {_TOPK}
"""


# ------------------------------------------------------ embedding_dim_stats


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.catalog import table_rows
    from stock_data_project_spark.plans.llm_next7 import _fan_out

    # explode-aware fan-out: a packed float-array column is ~64×
    # smaller on disk than its exploded row count, so
    # maxPartitionBytes under-splits the scan (a 60×-replicated
    # corpus arrived as ONE 30 MB split → the 7.7M-row explode ran
    # single-threaded, 17s; fanned out it's ~2s). r14: width is
    # data-derived (the _fan_out recipe) — the full-width constant
    # made this key 1.6× FASTER on 8 cores than 32 at sf0.1 (r13
    # verdict item 3); ~32 vector rows ≈ 2048 exploded rows per task.
    emb = _fan_out(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        rows_hint=table_rows(sf_dir, "embeddings"),
        rows_per_task=32,
    )
    vals = emb.select(F.posexplode("embedding").alias("dim", "_v")).select(
        F.col("dim").cast("int").alias("dim"), F.col("_v").cast("double").alias("v")
    )
    agg = vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s_d"),
        F.sum(F.round(F.col("v") * F.col("v"), 6).cast("decimal(18,6)")).alias(
            "ss_d"
        ),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )
    n = F.col("n").cast("double")
    s = F.col("s_d").cast("double")
    ss = F.col("ss_d").cast("double")
    var = (ss - s * s / n) / (n - 1)
    # mean = round(exact 6dp sum / count, 6): the corpus row count can
    # plausibly be a power of two — exact-integer HALF_UP on both
    # engines (operators/rounding; sign-safe, embedding sums can be
    # negative). std_v keeps double math: sqrt output is irrational
    # off a measure-zero set, not the decimal-tie class.
    return agg.select(
        "dim",
        "n",
        exact_avg6_expr("CAST(s_d * 1000000 AS BIGINT)", "n").alias("mean_v"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std_v"),
        "min_v",
        "max_v",
    )


_DIM_STATS_SQL = """
    WITH vals AS (
        SELECT CAST(unnest(range(len(embedding))) AS INT) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ), agg AS (
        SELECT dim, count(*) AS n,
               sum(CAST(v AS DECIMAL(18,6))) AS s_d,
               sum(CAST(round(v * v, 6) AS DECIMAL(18,6))) AS ss_d,
               round(min(v), 6) AS min_v,
               round(max(v), 6) AS max_v
        FROM vals GROUP BY dim
    )
    SELECT dim, n,
           {mean_v} AS mean_v,
           round(sqrt(greatest((CAST(ss_d AS DOUBLE)
                                - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                               / (CAST(n AS DOUBLE) - 1), 0.0)), 6) AS std_v,
           min_v, max_v
    FROM agg
""".format(
    mean_v=exact_avg6_sql("CAST(s_d * 1000000 AS BIGINT)", "n")
)


QUERIES_NEXT = {
    "tfidf_retrieval": q_tfidf_retrieval,
    "embedding_dim_stats": q_embedding_dim_stats,
}

ORACLE_NEXT = {
    "tfidf_retrieval": _TFIDF_SQL,
    "embedding_dim_stats": _DIM_STATS_SQL,
}
