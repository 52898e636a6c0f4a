"""Stock-analytics keys built late in r10 (second batch), staged for
the r12 window — econometric tests that complete the diagnostics
family, both FULLY oracled.

- ``variance_ratio`` — the Lo–MacKinlay variance-ratio test of the
  random-walk hypothesis at horizon q=5: VR(q) =
  Var(5-day overlapping return sum) / (q · Var(daily return)), and
  the homoskedastic z-statistic z = (VR−1)/√(2(2q−1)(q−1)/(3qn)).
  The q-sums are exact DECIMAL window sums over the 6dp return
  series (full windows only), both variances come from exact decimal
  Σ/Σ² aggregates (Spark (15,6)² under the precision cap, oracle
  (19,6)² in DuckDB's int128 tier), and VR/z evaluate in ONE shared
  double-expression string (every literal chain leads with a double
  CAST — the decimal-literal parse trap, stock_next10). Constant
  series → NULL via nullif.

- ``seasonality_strength`` — Hyndman's STL-based strength-of-
  component measures on the seasonal_decompose construction (whose
  exact trend/seasonal machinery from stock_next8 is replicated
  verbatim): F_seasonal = max(0, 1 − Var(resid)/Var(detrended)) and
  F_trend = max(0, 1 − Var(resid)/Var(deseasonalized)). Trend and
  per-dow seasonal means go through the exact-integer HALF_UP
  average, so detrended/resid/deseasonalized are exact DECIMALs;
  the three variances are exact-decimal Σ/Σ² pairs over the SAME
  full-window rows; ratios in one shared double string. Edge rows
  (trend undefined) are excluded identically by both engines.

Scale shape: one hash exchange on series_key serves all windows and
the final per-series aggregation; no joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.returns import with_daily_return
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS, _RET
from stock_data_project_spark.plans.stock_next8 import _SD_WIN
from stock_data_project_spark.plans.stock_next10 import _RR

_VR_Q = 5

# shared double-expression strings (identical text both engines)
_VR_VAR1 = (
    "((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_obs)"
    " / nullif(n_obs - 1.0, 0.0))"
)
_VR_VARQ = (
    "((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / n_windows)"
    " / nullif(n_windows - 1.0, 0.0))"
)
_VR = f"({_VR_VARQ} / nullif({_VR_Q}.0 * {_VR_VAR1}, 0.0))"
_VR_Z = (
    f"(({_VR} - 1.0) / nullif(sqrt("
    f"2.0 * (2.0 * {_VR_Q} - 1.0) * ({_VR_Q} - 1.0)"
    f" / (3.0 * {_VR_Q} * CAST(n_obs AS DOUBLE))), 0.0))"
)

_SS_FS = (
    "greatest(0.0, 1.0 - (CAST(rr2 AS DOUBLE) - CAST(rr1 AS DOUBLE)"
    " * CAST(rr1 AS DOUBLE) / n_obs)"
    " / nullif(CAST(dd2 AS DOUBLE) - CAST(dd1 AS DOUBLE)"
    " * CAST(dd1 AS DOUBLE) / n_obs, 0.0))"
)
_SS_FT = (
    "greatest(0.0, 1.0 - (CAST(rr2 AS DOUBLE) - CAST(rr1 AS DOUBLE)"
    " * CAST(rr1 AS DOUBLE) / n_obs)"
    " / nullif(CAST(ss2 AS DOUBLE) - CAST(ss1 AS DOUBLE)"
    " * CAST(ss1 AS DOUBLE) / n_obs, 0.0))"
)


def q_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = with_daily_return(daily_bars(load_table(spark, sf_dir, "events")))
    r = bars.filter(F.col("daily_return").isNotNull()).select(
        "series_key",
        "date",
        F.col("daily_return").cast("decimal(18,6)").alias("r_d"),
    )
    wq = (
        Window.partitionBy("series_key")
        .orderBy("date")
        .rowsBetween(-(_VR_Q - 1), 0)
    )
    withq = r.withColumn("cq", F.count(F.lit(1)).over(wq)).withColumn(
        "rq",
        F.when(F.col("cq") == _VR_Q, F.sum("r_d").over(wq)).cast("decimal(15,6)"),
    )
    g = withq.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("r_d").alias("s1"),
        F.sum(
            F.expr("CAST(r_d AS DECIMAL(15,6)) * CAST(r_d AS DECIMAL(15,6))")
        ).alias("s2"),
        F.count("rq").alias("n_windows"),
        F.sum("rq").alias("t1"),
        F.sum(F.col("rq") * F.col("rq")).alias("t2"),
    )
    return g.select(
        "series_key",
        "n_obs",
        "n_windows",
        (F.round(F.expr(_VR), 6) + 0.0).alias("vr"),
        (F.round(F.expr(_VR_Z), 6) + 0.0).alias("z_vr"),
    )


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = daily_bars(load_table(spark, sf_dir, "events")).select(
        "series_key", "date", "close"
    )
    w7 = (
        Window.partitionBy("series_key")
        .orderBy("date")
        .rowsBetween(-(_SD_WIN // 2), _SD_WIN // 2)
    )
    trended = (
        bars.withColumn("c_d", F.col("close").cast("decimal(18,6)"))
        .withColumn("cnt7", F.count(F.lit(1)).over(w7))
        .withColumn(
            "sum7_units",
            F.sum(F.expr("CAST(c_d * 1000000 AS BIGINT)")).over(w7),
        )
        .withColumn(
            "trend",
            F.when(
                F.col("cnt7") == _SD_WIN,
                exact_avg6_expr("sum7_units", str(_SD_WIN)),
            ),
        )
        .withColumn("det_d", F.col("c_d") - F.col("trend").cast("decimal(18,6)"))
        .withColumn(
            "dow",
            F.expr("CAST((unix_micros(date) div 86400000000) % 7 AS INT)"),
        )
    )
    wdow = Window.partitionBy("series_key", "dow")
    full = (
        trended.withColumn("n_det", F.count("det_d").over(wdow))
        .withColumn(
            "det_units",
            F.sum(F.expr("CAST(det_d * 1000000 AS BIGINT)")).over(wdow),
        )
        .withColumn(
            "seas",
            F.when(F.col("n_det") > 0, exact_avg6_expr("det_units", "n_det")).cast(
                "decimal(18,6)"
            ),
        )
        .filter(F.col("det_d").isNotNull())
        .withColumn("res_d", F.expr("CAST(det_d - seas AS DECIMAL(15,6))"))
        .withColumn("des_d", F.expr("CAST(c_d - seas AS DECIMAL(15,6))"))
        .withColumn("detc", F.expr("CAST(det_d AS DECIMAL(15,6))"))
    )
    g = full.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("res_d").alias("rr1"),
        F.sum(F.col("res_d") * F.col("res_d")).alias("rr2"),
        F.sum("detc").alias("dd1"),
        F.sum(F.col("detc") * F.col("detc")).alias("dd2"),
        F.sum("des_d").alias("ss1"),
        F.sum(F.col("des_d") * F.col("des_d")).alias("ss2"),
    )
    return g.select(
        "series_key",
        "n_obs",
        (F.round(F.expr(_SS_FS), 6) + 0.0).alias("seasonal_strength"),
        (F.round(F.expr(_SS_FT), 6) + 0.0).alias("trend_strength"),
    )


QUERIES_NEXT = {
    "variance_ratio": q_variance_ratio,
    "seasonality_strength": q_seasonality_strength,
}

ORACLE_NEXT = {
    "variance_ratio": f"""
        WITH {_BARS}, {_RET}, {_RR},
        wq AS (
            SELECT series_key, r_d,
                   count(*) OVER w AS cq,
                   CASE WHEN count(*) OVER w = {_VR_Q}
                        THEN CAST(sum(r_d) OVER w AS DECIMAL(19,6)) END AS rq
            FROM rr
            WINDOW w AS (PARTITION BY series_key ORDER BY date
                         ROWS BETWEEN {_VR_Q - 1} PRECEDING AND CURRENT ROW)
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(r_d) AS s1,
                   sum(CAST(r_d AS DECIMAL(19,6)) * CAST(r_d AS DECIMAL(19,6)))
                       AS s2,
                   CAST(count(rq) AS BIGINT) AS n_windows,
                   sum(rq) AS t1,
                   sum(rq * rq) AS t2
            FROM wq GROUP BY 1
        )
        SELECT series_key, n_obs, n_windows,
               round({_VR}, 6) + 0.0 AS vr,
               round({_VR_Z}, 6) + 0.0 AS z_vr
        FROM g
    """,
    "seasonality_strength": f"""
        WITH {_BARS},
        tr AS (
            SELECT series_key, date, close,
                   CAST(close AS DECIMAL(18,6)) AS c_d,
                   count(*) OVER w7 AS cnt7,
                   sum(CAST(CAST(close AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                       OVER w7 AS sum7_units,
                   CAST((epoch_us(date) // 86400000000) % 7 AS INT) AS dow
            FROM bars
            WINDOW w7 AS (PARTITION BY series_key ORDER BY date
                          ROWS BETWEEN {_SD_WIN // 2} PRECEDING
                                   AND {_SD_WIN // 2} FOLLOWING)
        ),
        td AS (
            SELECT series_key, date, c_d, dow,
                   CASE WHEN cnt7 = {_SD_WIN} THEN
                       c_d - CAST({exact_avg6_sql("sum7_units", str(_SD_WIN))}
                                  AS DECIMAL(18,6))
                   END AS det_d
            FROM tr
        ),
        sd AS (
            SELECT series_key, c_d, det_d,
                   CAST(CASE WHEN count(det_d) OVER wd > 0 THEN
                       {exact_avg6_sql(
                           "sum(CAST(det_d * 1000000 AS BIGINT)) OVER wd",
                           "count(det_d) OVER wd",
                       )}
                   END AS DECIMAL(18,6)) AS seas
            FROM td
            WINDOW wd AS (PARTITION BY series_key, dow)
        ),
        rows_full AS (
            SELECT series_key,
                   CAST(det_d - seas AS DECIMAL(19,6)) AS res_d,
                   CAST(c_d - seas AS DECIMAL(19,6)) AS des_d,
                   CAST(det_d AS DECIMAL(19,6)) AS detc
            FROM sd WHERE det_d IS NOT NULL
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(res_d) AS rr1, sum(res_d * res_d) AS rr2,
                   sum(detc) AS dd1, sum(detc * detc) AS dd2,
                   sum(des_d) AS ss1, sum(des_d * des_d) AS ss2
            FROM rows_full GROUP BY 1
        )
        SELECT series_key, n_obs,
               round({_SS_FS}, 6) + 0.0 AS seasonal_strength,
               round({_SS_FT}, 6) + 0.0 AS trend_strength
        FROM g
    """,
}
