"""Stock-analytics keys built at the close of r10, staged for the
r13 window — structural-break detection and cross-series lead-lag
discovery, both FULLY oracled.

- ``changepoint_detect`` — single structural-break detection per
  series via the maximum-CUSUM statistic (binary segmentation's
  first split): over the daily-return series, the scaled deviation
  D_k = |n·S_k − k·S_n| (S_k = running return sum) is EXACT decimal
  arithmetic — S_k capped back to (18,6) before the scale-0
  multiply so Spark's precision-38 cap never truncates scale, the
  oracle widened to the (19,x) int128 tier per the decimal-multiply
  rule — and the argmax position is ``max(struct(D, −k))`` (the
  aroon lexicographic-struct recipe: ties → earliest k, identical
  in both engines). The normalized statistic
  T = D_max / (n·σ̂·√n) — the Brownian-bridge standardization with
  sample σ̂ from exact Σ/Σ² — evaluates in ONE shared
  double-expression string from exact aggregates; degenerate series
  (n < 2 interior points, zero variance) yield NULL via nullif.

- ``lead_lag_corr`` — pairwise lead-lag correlation profile:
  corr(r_a(t), r_b(t+L)) for every series pair a < b at lags
  L ∈ {−2..2} (return_correlation's lag-0 join generalized to a
  direction-resolving profile; negative lags = b leads a). The b
  side precomputes all five shifted columns with ONE window pass,
  unpivots them to (date, lag, y) rows, and ONE date join serves
  every pair × lag. Sums are exact DECIMAL ((15,6) products under
  Spark's cap, (19,6) int128 in the oracle); the Pearson ratio runs
  in one shared double string with greatest(0,·) guarding the
  variance product against negative fp dust and +0.0 normalizing
  the sign at exact zeros. Boundary rows (shift past the series
  end) drop via y IS NOT NULL identically on both engines.

Scale shape: changepoint is one hash exchange on series_key serving
both windows and the final agg — no joins. lead_lag joins on date
only (the return_correlation shape): the per-date fan is
series-dimension-sized (a small dim by construction), and the five
lags ride the same join rather than five joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.returns import with_daily_return
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS, _RET
from stock_data_project_spark.plans.stock_next10 import _RR

_LL_LAGS = (-2, -1, 0, 1, 2)

# shared double-expression strings (identical text both engines)
_CP_VAR = (
    "((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_obs)"
    " / nullif(n_obs - 1.0, 0.0))"
)
# greatest(0, ·) guards fp dust: a constant-return series' variance
# expression can land a hair below zero in double, and DuckDB
# HARD-ERRORS on sqrt(negative) (Spark returns NaN) — the guard
# collapses the case to the intended NULL via the nullif
_CP_STAT = (
    f"(CAST(dmax AS DOUBLE) / nullif(CAST(n_obs AS DOUBLE)"
    f" * sqrt(greatest(CAST(0.0 AS DOUBLE), {_CP_VAR}))"
    f" * sqrt(CAST(n_obs AS DOUBLE)), 0.0))"
)

_LL_COV = (
    "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_obs)"
)
_LL_VX = (
    "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_obs)"
)
_LL_VY = (
    "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_obs)"
)
_LL_CORR = (
    f"({_LL_COV} / nullif(sqrt(greatest(CAST(0.0 AS DOUBLE),"
    f" {_LL_VX} * {_LL_VY})), 0.0))"
)


def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = with_daily_return(daily_bars(load_table(spark, sf_dir, "events")))
    r = bars.filter(F.col("daily_return").isNotNull()).select(
        "series_key",
        "date",
        F.col("daily_return").cast("decimal(18,6)").alias("r_d"),
    )
    wrun = (
        Window.partitionBy("series_key")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("series_key")
    scored = (
        r.withColumn("k", F.row_number().over(Window.partitionBy("series_key").orderBy("date")))
        .withColumn("s_k", F.sum("r_d").over(wrun).cast("decimal(18,6)"))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("s_n", F.sum("r_d").over(wall).cast("decimal(18,6)"))
    )
    # interior rows only feed the argmax: the WHOLE struct is
    # conditional (a NULL struct is skipped by max on both engines; a
    # struct with a NULL field would enter Spark's ordering)
    am_struct = F.when(
        F.col("k") < F.col("n"),
        F.struct(
            F.abs(
                F.col("n").cast("decimal(10,0)") * F.col("s_k")
                - F.col("k").cast("decimal(10,0)") * F.col("s_n")
            ).alias("d"),
            (-F.col("k")).alias("nk"),
        ),
    )
    g = scored.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("r_d").alias("s1"),
        F.sum(
            F.expr("CAST(r_d AS DECIMAL(15,6)) * CAST(r_d AS DECIMAL(15,6))")
        ).alias("s2"),
        F.max(am_struct).alias("am"),
    )
    g2 = g.select(
        "series_key",
        "n_obs",
        "s1",
        "s2",
        (-F.col("am.nk")).cast("int").alias("cp_k"),
        F.col("am.d").alias("dmax"),
    )
    return g2.select(
        "series_key",
        "n_obs",
        "cp_k",
        F.col("dmax").cast("double").alias("cp_dmax"),
        (F.round(F.expr(_CP_STAT), 6) + 0.0).alias("cp_stat"),
    )


def q_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = with_daily_return(daily_bars(load_table(spark, sf_dir, "events")))
    r = bars.filter(F.col("daily_return").isNotNull()).select(
        "series_key",
        "date",
        F.col("daily_return").cast("decimal(18,6)").alias("r_d"),
    )
    w = Window.partitionBy("series_key").orderBy("date")
    shifted = r
    for lag in _LL_LAGS:
        if lag > 0:
            col = F.lead("r_d", lag).over(w)
        elif lag < 0:
            col = F.lag("r_d", -lag).over(w)
        else:
            col = F.col("r_d")
        shifted = shifted.withColumn(f"_y{lag}", col)
    b_long = shifted.select(
        F.col("series_key").alias("key_b"),
        "date",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lag).alias("lag"), F.col(f"_y{lag}").alias("y")
                    )
                    for lag in _LL_LAGS
                ]
            )
        ).alias("ly"),
    ).select(
        "key_b",
        "date",
        F.col("ly.lag").alias("lag"),
        F.col("ly.y").alias("y"),
    ).filter(F.col("y").isNotNull())
    a = r.select(
        F.col("series_key").alias("key_a"), "date", F.col("r_d").alias("x")
    )
    g = (
        a.join(b_long, "date")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(
                F.expr(
                    "CAST(x AS DECIMAL(15,6)) * CAST(y AS DECIMAL(15,6))"
                )
            ).alias("sxy"),
            F.sum(
                F.expr(
                    "CAST(x AS DECIMAL(15,6)) * CAST(x AS DECIMAL(15,6))"
                )
            ).alias("sxx"),
            F.sum(
                F.expr(
                    "CAST(y AS DECIMAL(15,6)) * CAST(y AS DECIMAL(15,6))"
                )
            ).alias("syy"),
        )
    )
    return g.select(
        "key_a",
        "key_b",
        "lag",
        "n_obs",
        (F.round(F.expr(_LL_CORR), 6) + 0.0).alias("xcorr"),
    )


QUERIES_NEXT = {
    "changepoint_detect": q_changepoint_detect,
    "lead_lag_corr": q_lead_lag_corr,
}

ORACLE_NEXT = {
    # scaled CUSUM deviation exact in the int128 tier; argmax via the
    # aroon struct recipe (struct_pack/struct_extract, NULL rows past
    # the interior skipped by max); the shared double string from
    # exact aggregates.
    "changepoint_detect": f"""
        WITH {_BARS}, {_RET}, {_RR},
        sc AS (
            SELECT series_key, r_d,
                   row_number() OVER wo AS k,
                   CAST(sum(r_d) OVER wrun AS DECIMAL(19,6)) AS s_k,
                   count(*) OVER wall AS n,
                   CAST(sum(r_d) OVER wall AS DECIMAL(19,6)) AS s_n
            FROM rr
            WINDOW wo AS (PARTITION BY series_key ORDER BY date),
                   wrun AS (PARTITION BY series_key ORDER BY date
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wall AS (PARTITION BY series_key)
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(r_d) AS s1,
                   sum(CAST(r_d AS DECIMAL(19,6)) * CAST(r_d AS DECIMAL(19,6)))
                       AS s2,
                   max(CASE WHEN k < n THEN struct_pack(
                       d := abs(CAST(n AS DECIMAL(19,0)) * s_k
                                - CAST(k AS DECIMAL(19,0)) * s_n),
                       nk := -k) END) AS am
            FROM sc GROUP BY 1
        ),
        g2 AS (
            SELECT series_key, n_obs, s1, s2,
                   CAST(-struct_extract(am, 'nk') AS INT) AS cp_k,
                   struct_extract(am, 'd') AS dmax
            FROM g
        )
        SELECT series_key, n_obs, cp_k,
               CAST(dmax AS DOUBLE) AS cp_dmax,
               round({_CP_STAT}, 6) + 0.0 AS cp_stat
        FROM g2
    """,
    # five UNION ALL shift arms replicate the one-pass window
    # unpivot; one date join serves every pair x lag, then the
    # identical shared double string over exact (19,6) sums.
    "lead_lag_corr": f"""
        WITH {_BARS}, {_RET}, {_RR},
        b_long AS (
            SELECT series_key AS key_b, date, -2 AS lag,
                   lag(r_d, 2) OVER wm2 AS y FROM rr
            WINDOW wm2 AS (PARTITION BY series_key ORDER BY date)
            UNION ALL
            SELECT series_key, date, -1, lag(r_d, 1) OVER wm1 FROM rr
            WINDOW wm1 AS (PARTITION BY series_key ORDER BY date)
            UNION ALL
            SELECT series_key, date, 0, r_d FROM rr
            UNION ALL
            SELECT series_key, date, 1, lead(r_d, 1) OVER wp1 FROM rr
            WINDOW wp1 AS (PARTITION BY series_key ORDER BY date)
            UNION ALL
            SELECT series_key, date, 2, lead(r_d, 2) OVER wp2 FROM rr
            WINDOW wp2 AS (PARTITION BY series_key ORDER BY date)
        ),
        g AS (
            SELECT a.series_key AS key_a, b.key_b, CAST(b.lag AS INT) AS lag,
                   CAST(count(*) AS BIGINT) AS n_obs,
                   sum(a.r_d) AS sx,
                   sum(b.y) AS sy,
                   sum(CAST(a.r_d AS DECIMAL(19,6)) * CAST(b.y AS DECIMAL(19,6)))
                       AS sxy,
                   sum(CAST(a.r_d AS DECIMAL(19,6)) * CAST(a.r_d AS DECIMAL(19,6)))
                       AS sxx,
                   sum(CAST(b.y AS DECIMAL(19,6)) * CAST(b.y AS DECIMAL(19,6)))
                       AS syy
            FROM rr a JOIN b_long b
              ON a.date = b.date AND a.series_key < b.key_b
            WHERE b.y IS NOT NULL
            GROUP BY 1, 2, 3
        )
        SELECT key_a, key_b, lag, n_obs,
               round({_LL_CORR}, 6) + 0.0 AS xcorr
        FROM g
    """,
}
