"""Classifier calibration sweep, built r13 and staged for the r14
window (the r12 verdict's item 7: "a quality-classifier
calibration/threshold-sweep key — the model-based gate's
operating-point audit").

``classifier_calibration`` sweeps a fixed threshold grid over the
fully-oracled ``quality_classifier`` per-doc score (llm_next9's
hashed linear scorer, score_per_token in exact 6dp) against the
corpus's language label (label = lang = 'en' — the same proxy ground
truth retrieval_ndcg grades relevance with) and reports the full
operating-point table: confusion counts, precision, recall, F1 per
threshold.

Scale shape: ONE corpus pass bins every doc by how many grid
thresholds its score clears (a codegen scalar — no per-threshold
corpus pass, no |docs|×T crossJoin), the (bin, label) rollup is a
metadata-sized partial-aggregatable groupBy (≤ (T+1)·2 rows), and
the per-threshold suffix sums run over that tiny frame via a
broadcast triangular join — the distributed_ntile offsets recipe.
At 100 TB the corpus cost is exactly the classifier scan itself.

Exactness: every metric is a ratio of exact BIGINT counts through
the exact-integer HALF_UP identity (operators/rounding); zero
denominators (no predicted positives at a high threshold, or a
single-class corpus) CASE-NULL identically on both engines — NULL,
not a sentinel, because an undefined precision is not a 0.0
precision. F1 uses the 2tp/(2tp+fp+fn) identity so it needs no
division by P+R (which would compound two rounded ratios).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.plans.llm import _NORM
from stock_data_project_spark.plans.llm_next9 import _HEX, _WMOD, _WMUL
from stock_data_project_spark.operators.textops import words

# fixed grid: token weights live in [-500, 500], so per-token scores
# do too; the grid spans the mass observed at every SF while staying
# data-independent (a data-derived grid would need exact quantiles —
# a second corpus pass for no audit value)
_THRESHOLDS = (-200, -150, -100, -50, 0, 50, 100, 150, 200)


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label, s): the quality_classifier score_per_token
    (exact 6dp) plus the language proxy label — one tokenize scan."""
    from stock_data_project_spark.catalog import table_rows
    from stock_data_project_spark.plans.llm_next7 import _fan_out

    docs = _fan_out(
        spark,
        load_table(spark, sf_dir, "documents"),
        rows_hint=table_rows(sf_dir, "documents"),
        rows_per_task=1024,  # tokenize+md5 per word: codegen µs/row
    )
    toks = docs.select(
        "doc_id", "lang", F.explode(words("text")).alias("word")
    ).filter(F.col("word") != "")
    h = F.md5(F.col("word"))
    feat = (
        (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1)
    ).cast("bigint")
    return (
        toks.select(
            "doc_id",
            "lang",
            ((feat * F.lit(_WMUL)) % _WMOD - 500).alias("w"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("w").alias("score"))
        .select(
            "doc_id",
            (F.col("lang") == "en").cast("int").alias("label"),
            exact_avg6_expr("score * 1000000", "n_tokens").alias("s"),
        )
    )


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    # bin = how many grid thresholds the score clears (0..T): one
    # codegen scalar per doc, so the threshold sweep never re-scans
    # the corpus. Thresholds are integers and s is an exact 6dp
    # double, so s >= t is an exact comparison.
    bin_expr = sum(
        (F.col("s") >= F.lit(float(t))).cast("int") for t in _THRESHOLDS
    )
    bins = (
        scored.select(F.col("label"), bin_expr.alias("bin"))
        .groupBy("bin", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    thr = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(_THRESHOLDS)], "i int, threshold int"
    )
    # suffix sums over the metadata-sized bin rollup: predicted
    # positive at threshold i <=> bin >= i (triangular broadcast
    # join, the distributed_ntile offsets recipe)
    agg = (
        F.broadcast(thr)
        .join(bins, F.lit(True), "left")
        .groupBy("i", "threshold")
        .agg(
            F.sum(
                F.when(
                    (F.col("bin") >= F.col("i")) & (F.col("label") == 1),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("bin") >= F.col("i")) & (F.col("label") == 0),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("bin") < F.col("i")) & (F.col("label") == 1),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("fn"),
            F.sum(
                F.when(
                    (F.col("bin") < F.col("i")) & (F.col("label") == 0),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("tn"),
        )
    )
    def ratio(p: str, q: str):
        return F.when(
            F.expr(q) > 0, exact_avg6_expr(f"({p}) * 1000000", q)
        ).otherwise(F.lit(None).cast("double"))

    return agg.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        ratio("tp", "tp + fp").alias("precision"),
        ratio("tp", "tp + fn").alias("recall"),
        ratio("2 * tp", "2 * tp + fp + fn").alias("f1"),
    )


_THR_VALUES = ", ".join(f"({i + 1}, {t})" for i, t in enumerate(_THRESHOLDS))
_BIN_SQL = " + ".join(
    f"CAST(s >= CAST({t} AS DOUBLE) AS INT)" for t in _THRESHOLDS
)


def _cal_ratio_sql(p: str, q: str) -> str:
    return (
        f"CASE WHEN ({q}) > 0 THEN "
        f"{exact_avg6_sql(f'({p}) * 1000000', q)} ELSE NULL END"
    )


_CAL_SQL = f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split({_NORM}, ' ')) AS word
        FROM documents
    ), feat AS (
        SELECT doc_id, lang,
               CAST((strpos('{_HEX}', substr(md5(word), 1, 1)) - 1) * 16
                    + (strpos('{_HEX}', substr(md5(word), 2, 1)) - 1)
                    AS BIGINT) AS f
        FROM toks WHERE word <> ''
    ), scored AS (
        SELECT doc_id, CAST(lang = 'en' AS INT) AS label,
               {exact_avg6_sql(
                   "CAST(sum((f * " + str(_WMUL) + ") % " + str(_WMOD)
                   + " - 500) AS BIGINT) * 1000000",
                   "count(*)",
               )} AS s
        FROM feat GROUP BY doc_id, lang
    ), bins AS (
        SELECT {_BIN_SQL} AS bin, label, count(*) AS cnt
        FROM scored GROUP BY 1, 2
    ), thr(i, threshold) AS (VALUES {_THR_VALUES}),
    agg AS (
        SELECT t.i, t.threshold,
               CAST(coalesce(sum(CASE WHEN b.bin >= t.i AND b.label = 1
                    THEN b.cnt END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN b.bin >= t.i AND b.label = 0
                    THEN b.cnt END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN b.bin < t.i AND b.label = 1
                    THEN b.cnt END), 0) AS BIGINT) AS fn,
               CAST(coalesce(sum(CASE WHEN b.bin < t.i AND b.label = 0
                    THEN b.cnt END), 0) AS BIGINT) AS tn
        FROM thr t LEFT JOIN bins b ON true
        GROUP BY t.i, t.threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           {_cal_ratio_sql('tp', 'tp + fp')} AS precision,
           {_cal_ratio_sql('tp', 'tp + fn')} AS recall,
           {_cal_ratio_sql('2 * tp', '2 * tp + fp + fn')} AS f1
    FROM agg
"""


QUERIES_NEXT = {
    "classifier_calibration": q_classifier_calibration,
}

ORACLE_NEXT = {
    "classifier_calibration": _CAL_SQL,
}
