"""LLM-pipeline corpus-governance keys built in r12, staged for the
r13 window (the r11 verdict's item 6 capability batch: source-level
corpus filtering, paragraph-grain dedup, exact-substring spans).

- ``segment_dedup`` — the paragraph-grain generalization of
  ``line_dedup`` (CCNet/RefinedWeb remove boilerplate at line grain;
  this corpus is single-line, so the non-degenerate grain here is
  fixed 10-word segments): every doc is cut into aligned 10-token
  segments, a segment's FIRST occurrence in corpus order
  (lexicographic (doc_id, seg_idx)) is kept and every later identical
  segment is dropped; per-doc retained counts/ratio come back out.
  Winner election is min(struct(doc_id, seg_idx)) per segment text —
  a partial-aggregatable groupBy (map-side combine collapses each hot
  boilerplate segment to one row per partition), NOT a row_number
  window, so a segment shared by 10^9 docs never builds a 10^9-row
  sort partition at 100 TB. Plain min/max over structs sorts
  lexicographically identically in Spark and DuckDB (the aroon rule).

- ``exact_substring_spans`` — Lee et al. 2022 ("Deduplicating
  Training Data Makes Language Models Better") exact-substring dedup
  re-expressed relationally: their suffix-array pass marks every
  ≥50-token run that appears twice in the corpus; the Spark-native
  equivalent marks every W=10-token shingle occurring ≥2 times
  corpus-wide (count over ALL occurrences, so within-doc repetition
  counts, like the suffix array), then merges overlapping duplicated
  shingle starts into maximal runs per doc (gaps-and-islands: a new
  run starts when the gap between duplicated starts exceeds W).
  Output per doc: run count, covered tokens, longest run, coverage
  fraction. Shingle frequency is one partial-aggregatable groupBy;
  the join back to occurrences is linear in occurrence count; the
  island window is per-doc (uniform keys).

- ``source_quality_gate`` — source-level governance (the
  URL/domain-level corpus filtering of web pipelines, transposed to
  this corpus's ``source`` column — its domain analog): per-source
  doc/token totals, type-token ratio, stopword density, mean doc
  length, corpus token share, and the keep/flag decision a curation
  run would enforce. All ratios go through the exact-integer
  HALF_UP identity (operators/rounding) so the 6dp values are
  bit-identical on both engines and the threshold comparison can
  never straddle an engine rounding difference.

- ``source_quota_resample`` — deterministic per-source token quota
  (the cap_per_key semantics made FULLY oracle-able): docs are
  ordered inside each source by an engine-neutral 32-bit
  multiplicative hash (Knuth 2654435761 — plain BIGINT arithmetic
  both engines; xxhash64 has no DuckDB twin, which is why
  cap_per_key is rows-only), a running token cumsum is taken in that
  order, and a doc is kept while the cumsum stays inside the quota.
  The hash input is masked to 31 bits BEFORE the multiply so the
  product stays inside BIGINT under ANSI at any doc_id width.

Scale notes: every tokenize explode is wrapped in llm_next7._fan_out
(the explode-over-scan under-split rule); the only non-uniform
shuffle key is ``source`` (20 values) whose aggregates are
partial-aggregatable 20-row outputs; the 1-row corpus-total
broadcast in the gate is the whitelisted scalar-bind class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.cache import checkpoint_release
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.operators.textops import STOPWORDS, words

_SEG = 10  # segment_dedup grain (tokens)
_W = 10  # exact_substring_spans shingle width (tokens)
_QUOTA = 800  # source_quota_resample per-source token budget
_TTR_MIN = 0.43  # source gate: minimum type-token ratio
_SWD_MAX = 0.07  # source gate: maximum stopword density

_TOKEN_SPLIT_SQL = (
    "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
)


def _docs_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, ws, n) — one fan-out-guarded scan with the
    token array and its length."""
    from stock_data_project_spark.catalog import table_rows
    from stock_data_project_spark.plans.llm_next7 import _fan_out

    return (
        _fan_out(
            spark,
            load_table(spark, sf_dir, "documents"),
            rows_hint=table_rows(sf_dir, "documents"),
            rows_per_task=1024,  # tokenize+explode: codegen µs/row
        )
        .select("doc_id", "source", words("text").alias("ws"))
        .withColumn("n", F.size("ws"))
    )


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n, pos, w) token rows — posexplode over
    ``_docs_ws``; ``n`` is computed BEFORE the explode (no second
    window pass)."""
    return _docs_ws(spark, sf_dir).select(
        "doc_id",
        "source",
        "n",
        F.posexplode("ws").alias("pos", "w"),
    )


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SORT-FREE segment construction: explode segment INDICES (not
    # tokens) and slice+array_join the words array — all codegen
    # scalar expressions in one map stage. The window-lead variant
    # (shingle_rows' stride twin) measured 2.6s for this frame at
    # sf0.1 vs 0.4s warm for the slice form: WindowExec is not
    # whole-stage-codegen'd and its doc_id shuffle+sort buys nothing
    # here. slice past the array end returns the shorter tail, which
    # IS the trailing partial segment.
    docs = _docs_ws(spark, sf_dir)
    segs = docs.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n + {_SEG - 1}) div {_SEG} - 1"))
        ).alias("seg_idx"),
        "ws",
    ).select(
        "doc_id",
        F.col("seg_idx").cast("int").alias("seg_idx"),
        F.array_join(
            F.slice("ws", F.col("seg_idx") * _SEG + 1, _SEG), " "
        ).alias("seg_text"),
        F.least(F.lit(_SEG), F.col("n") - F.col("seg_idx") * _SEG).alias(
            "seg_tokens"
        ),
    )
    # segs feeds the winner election AND the flag join — the
    # multi-consumer persist rule (hash plan, pure compute reuse; the
    # subtree is map-only and cheap, but the persisted frame is also
    # the join build input twice at 100 TB). Released below via
    # checkpoint_release (the r12-verdict persist-leak fix).
    segs = segs.persist()
    winners = segs.groupBy("seg_text").agg(
        F.min(
            F.struct(F.col("doc_id").alias("d"), F.col("seg_idx").alias("s"))
        ).alias("_w")
    )
    flagged = segs.join(winners, "seg_text").select(
        "doc_id",
        "seg_tokens",
        (
            (F.col("doc_id") == F.col("_w.d"))
            & (F.col("seg_idx") == F.col("_w.s"))
        )
        .cast("int")
        .alias("kept"),
    )
    out = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("kept").alias("n_segments_kept"),
            F.sum("seg_tokens").alias("n_tokens"),
            F.sum(F.expr("kept * seg_tokens")).alias("n_tokens_kept"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_segments_kept",
            "n_tokens",
            "n_tokens_kept",
            exact_avg6_expr("n_tokens_kept * 1000000", "n_tokens").alias(
                "retained_ratio"
            ),
        )
    )
    # per-doc aggregate (bounded) — materialize, release segs
    return checkpoint_release(out, segs)


_SEGMENT_DEDUP_SQL = f"""
    WITH arr AS (
        SELECT doc_id, {_TOKEN_SPLIT_SQL} AS ws FROM documents
    ), tok AS (
        SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos,
               unnest(ws) AS w
        FROM arr
    ), seg AS (
        SELECT doc_id, pos // {_SEG} AS seg_idx,
               string_agg(w, ' ' ORDER BY pos) AS seg_text,
               CAST(count(*) AS BIGINT) AS seg_tokens
        FROM tok GROUP BY 1, 2
    ), winners AS (
        SELECT seg_text,
               min(struct_pack(d := doc_id, s := seg_idx)) AS win
        FROM seg GROUP BY 1
    ), flagged AS (
        SELECT s.doc_id, s.seg_tokens,
               CAST(s.doc_id = struct_extract(win, 'd')
                    AND s.seg_idx = struct_extract(win, 's') AS INT) AS kept
        FROM seg s JOIN winners USING (seg_text)
    ), per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(kept) AS BIGINT) AS n_segments_kept,
               CAST(sum(seg_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(kept * seg_tokens) AS BIGINT) AS n_tokens_kept
        FROM flagged GROUP BY 1
    )
    SELECT doc_id, n_segments, n_segments_kept, n_tokens, n_tokens_kept,
           {exact_avg6_sql("n_tokens_kept * 1000000", "n_tokens")}
               AS retained_ratio
    FROM per_doc
"""


def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # slice-based shingles (the segment_dedup sort-free construction
    # at stride 1): full windows only — docs shorter than _W have no
    # duplicated substring of length _W by definition
    docs = _docs_ws(spark, sf_dir)
    sh = docs.filter(F.col("n") >= _W).select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - _W)).alias("pos"),
        "ws",
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(F.slice("ws", F.col("pos") + 1, _W), " ").alias("g"),
    )
    # sh feeds the frequency agg AND the dup join (multi-consumer
    # persist rule); base re-reads the doc scan, but that branch is
    # pruned to (doc_id, n) so the re-scan is cheap
    sh = sh.persist()
    # ALL occurrences (not distinct docs): within-doc repetition is a
    # duplicated substring too, matching the suffix-array semantics
    freq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("_c"))
    dup = sh.join(freq.filter(F.col("_c") >= 2), "g").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup.withColumn("_prev", F.lag("pos").over(wd))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > _W),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_run",
            F.sum("_new").over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "_run")
        .agg((F.max("pos") - F.min("pos") + _W).alias("_covered"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_n_runs"),
            F.sum("_covered").alias("_dup_tokens"),
            F.max("_covered").cast("int").alias("_max_run"),
        )
    )
    base = docs.select("doc_id", "n")
    out = base.join(runs, "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("_n_runs"), F.lit(0).cast("long")).alias("n_dup_runs"),
        F.coalesce(F.col("_dup_tokens").cast("long"), F.lit(0).cast("long")).alias(
            "dup_tokens"
        ),
        F.coalesce(F.col("_max_run"), F.lit(0)).cast("int").alias(
            "max_run_tokens"
        ),
        exact_avg6_expr(
            "coalesce(_dup_tokens, 0) * 1000000", "CAST(n AS BIGINT)"
        ).alias("dup_fraction"),
    )
    # per-doc aggregate (bounded) — materialize, release sh
    return checkpoint_release(out, sh)


_EXACT_SUBSTRING_SQL = f"""
    WITH arr AS (
        SELECT doc_id, {_TOKEN_SPLIT_SQL} AS ws FROM documents
    ), tok AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
               generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS w
        FROM arr
    ), sh0 AS (
        SELECT doc_id, pos, n,
               string_agg(w, ' ') OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS g
        FROM tok
    ), sh AS (
        SELECT * FROM sh0 WHERE pos + {_W - 1} < n
    ), freq AS (
        SELECT g FROM sh GROUP BY g HAVING count(*) >= 2
    ), dup AS (
        SELECT doc_id, pos FROM sh JOIN freq USING (g)
    ), flagged AS (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER w IS NULL
                         OR pos - lag(pos) OVER w > {_W}
                    THEN 1 ELSE 0 END AS new_run
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), runs0 AS (
        SELECT doc_id, pos,
               sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS run_id
        FROM flagged
    ), run_agg AS (
        SELECT doc_id, run_id,
               max(pos) - min(pos) + {_W} AS covered
        FROM runs0 GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_runs,
               CAST(sum(covered) AS BIGINT) AS dup_tokens,
               CAST(max(covered) AS INT) AS max_run
        FROM run_agg GROUP BY 1
    ), base AS (
        SELECT DISTINCT doc_id, n FROM tok
    )
    SELECT b.doc_id,
           b.n AS n_tokens,
           CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_dup_runs,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(coalesce(p.max_run, 0) AS INT) AS max_run_tokens,
           {exact_avg6_sql("coalesce(p.dup_tokens, 0) * 1000000", "b.n")}
               AS dup_fraction
    FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


def q_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tok(spark, sf_dir)
    per_doc = tok.groupBy("doc_id", "source", "n").agg(
        F.countDistinct("w").alias("_d"),
        F.sum(F.col("w").isin(list(STOPWORDS["en"])).cast("long")).alias(
            "_sw"
        ),
    )
    # agg feeds both the corpus-total rollup AND the output projection
    # — without a materialization the whole tokenize pipeline runs
    # twice (the r13 before-plan duplicated the full subtree under the
    # total's BroadcastExchange; ReuseExchange does not fire across
    # the agg boundary). |sources| = 20 rows, so an eager
    # localCheckpoint is metadata-sized and the downstream (broadcast
    # + projection) has no parallelism to lose.
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n").cast("long")).alias("total_tokens"),
        F.sum("_d").alias("_dist"),
        F.sum("_sw").alias("_sw_occ"),
    ).localCheckpoint(eager=True)
    total = agg.agg(F.sum("total_tokens").alias("_corpus_tokens"))
    out = agg.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "total_tokens",
        exact_avg6_expr("total_tokens * 1000000", "n_docs").alias(
            "mean_doc_tokens"
        ),
        exact_avg6_expr("_dist * 1000000", "total_tokens").alias(
            "type_token_ratio"
        ),
        exact_avg6_expr("_sw_occ * 1000000", "total_tokens").alias(
            "stopword_density"
        ),
        exact_avg6_expr("total_tokens * 1000000", "_corpus_tokens").alias(
            "token_share"
        ),
    )
    # the decision compares two exact-integer-rounded doubles that are
    # bit-identical across engines to constants that sit between
    # observed 6dp values — never on one
    return out.withColumn(
        "keep",
        (
            (F.col("type_token_ratio") >= F.lit(_TTR_MIN))
            & (F.col("stopword_density") <= F.lit(_SWD_MAX))
        ).cast("int"),
    )


_SW_LIST_SQL = ", ".join(f"'{s}'" for s in STOPWORDS["en"])

_SOURCE_GATE_SQL = f"""
    WITH arr AS (
        SELECT doc_id, source, {_TOKEN_SPLIT_SQL} AS ws FROM documents
    ), tok AS (
        SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n,
               unnest(ws) AS w
        FROM arr
    ), per_doc AS (
        SELECT doc_id, source, n,
               CAST(count(DISTINCT w) AS BIGINT) AS d,
               CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END)
                    AS BIGINT) AS sw
        FROM tok GROUP BY 1, 2, 3
    ), agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS total_tokens,
               CAST(sum(d) AS BIGINT) AS dist,
               CAST(sum(sw) AS BIGINT) AS sw_occ
        FROM per_doc GROUP BY 1
    ), total AS (
        SELECT CAST(sum(total_tokens) AS BIGINT) AS corpus_tokens FROM agg
    ), scored AS (
        SELECT source, n_docs, total_tokens,
               {exact_avg6_sql("total_tokens * 1000000", "n_docs")}
                   AS mean_doc_tokens,
               {exact_avg6_sql("dist * 1000000", "total_tokens")}
                   AS type_token_ratio,
               {exact_avg6_sql("sw_occ * 1000000", "total_tokens")}
                   AS stopword_density,
               {exact_avg6_sql("total_tokens * 1000000", "corpus_tokens")}
                   AS token_share
        FROM agg, total
    )
    SELECT *,
           CAST(type_token_ratio >= {_TTR_MIN}
                AND stopword_density <= {_SWD_MAX} AS INT) AS keep
    FROM scored
"""


def q_source_quota_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(words("text")).cast("long").alias("n_tokens"),
    )
    # engine-neutral deterministic shuffle order: Knuth multiplicative
    # hash in plain BIGINT arithmetic (31-bit mask BEFORE the multiply
    # keeps the product inside BIGINT under ANSI at any doc_id width)
    h = F.expr("pmod(pmod(doc_id, 2147483648) * 2654435761, 4294967296)")
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("h", h)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= F.lit(_QUOTA)).cast("int").alias("kept"),
        )
    )


_QUOTA_SQL = f"""
    WITH docs AS (
        SELECT doc_id, source,
               CAST(len({_TOKEN_SPLIT_SQL}) AS BIGINT) AS n_tokens,
               ((((doc_id % 2147483648) + 2147483648) % 2147483648)
                * 2654435761) % 4294967296 AS h
        FROM documents
    ), cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
        FROM docs
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           CAST(cum_tokens <= {_QUOTA} AS INT) AS kept
    FROM cum
"""


QUERIES_NEXT = {
    "segment_dedup": q_segment_dedup,
    "exact_substring_spans": q_exact_substring_spans,
    "source_quality_gate": q_source_quality_gate,
    "source_quota_resample": q_source_quota_resample,
}

ORACLE_NEXT = {
    "segment_dedup": _SEGMENT_DEDUP_SQL,
    "exact_substring_spans": _EXACT_SUBSTRING_SQL,
    "source_quality_gate": _SOURCE_GATE_SQL,
    "source_quota_resample": _QUOTA_SQL,
}
