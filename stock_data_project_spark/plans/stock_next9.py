"""Stock-analytics keys built in r10 (late batch), staged for the
r12 window.

``spearman_corr`` — Spearman rank correlation between daily close and
daily volume per series (the monotone-association diagnostic: does
price level co-move with activity?), FULLY oracled via exact integer
rank arithmetic:

- average-tie ranks carried in HALF-UNITS without any per-value
  cumulative table: 2·r = 2·rank() + t − 1, where rank() is the
  standard min-rank (identical semantics both engines) and t the
  partition-wise equal-value count. Integer-exact for both variables
  (close ordering compares the same double values on both engines;
  volume is a BIGINT count, tie-heavy by construction — which is the
  point: the tie path is exercised, not avoided).
- Pearson on the half-unit ranks via the welch_ttest decimal recipe:
  Σr, Σr², Σrxy exact; num = n·Σxy − Σx·Σy and the two variance
  numerators in scale-0 DECIMAL with widths exact on BOTH engines
  ((12,0)·(25,0) and (19,0)² — DuckDB's int128 tier, Spark under the
  precision-38 cap; scale-0 never truncates).
- only the final ratio enters DOUBLE with the same expression shape,
  rounded + sign-normalized; constant series (zero variance) yield
  NULL via nullif.

Scale shape: two ranking windows + one tie-count window per variable
over the SAME series_key hash exchange (one shuffle serves all), then
one hash agg to a per-series row. No joins, no collects. A global
(unpartitioned) rank never appears — ranks are per series by
definition, so the window parallelizes across series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = daily_bars(load_table(spark, sf_dir, "events")).select(
        "series_key", "close", "volume"
    )
    wx = Window.partitionBy("series_key").orderBy("close")
    wxe = Window.partitionBy("series_key", "close")
    wy = Window.partitionBy("series_key").orderBy("volume")
    wye = Window.partitionBy("series_key", "volume")
    r = bars.withColumn(
        "rx2", 2 * F.rank().over(wx) + F.count(F.lit(1)).over(wxe) - 1
    ).withColumn("ry2", 2 * F.rank().over(wy) + F.count(F.lit(1)).over(wye) - 1)
    g = r.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(
            F.expr("CAST(rx2 AS DECIMAL(12,0)) * CAST(ry2 AS DECIMAL(12,0))")
        ).alias("sxy"),
        F.sum(
            F.expr("CAST(rx2 AS DECIMAL(12,0)) * CAST(rx2 AS DECIMAL(12,0))")
        ).alias("sxx"),
        F.sum(
            F.expr("CAST(ry2 AS DECIMAL(12,0)) * CAST(ry2 AS DECIMAL(12,0))")
        ).alias("syy"),
    )
    num = (
        "CAST(n_days AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(25,0))"
        " - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))"
    )
    den1 = (
        "CAST(n_days AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(25,0))"
        " - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))"
    )
    den2 = (
        "CAST(n_days AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(25,0))"
        " - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))"
    )
    return g.select(
        "series_key",
        "n_days",
        (
            F.round(
                F.expr(
                    f"try_divide(CAST({num} AS DOUBLE),"
                    f" nullif(sqrt(CAST({den1} AS DOUBLE)"
                    f" * CAST({den2} AS DOUBLE)), 0.0))"
                ),
                6,
            )
            + 0.0
        ).alias("rho_spearman"),
    )


QUERIES_NEXT = {"spearman_corr": q_spearman_corr}

_SP_NUM = (
    "CAST(n_days AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(25,0))"
    " - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))"
)
_SP_DEN1 = (
    "CAST(n_days AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(25,0))"
    " - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))"
)
_SP_DEN2 = (
    "CAST(n_days AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(25,0))"
    " - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))"
)

ORACLE_NEXT = {
    "spearman_corr": f"""
        WITH {_BARS},
        r AS (
            SELECT series_key,
                   2 * rank() OVER (PARTITION BY series_key ORDER BY close)
                     + count(*) OVER (PARTITION BY series_key, close) - 1 AS rx2,
                   2 * rank() OVER (PARTITION BY series_key ORDER BY volume)
                     + count(*) OVER (PARTITION BY series_key, volume) - 1 AS ry2
            FROM bars
        ),
        g AS (
            SELECT series_key,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(rx2) AS BIGINT) AS sx,
                   CAST(sum(ry2) AS BIGINT) AS sy,
                   sum(CAST(rx2 AS DECIMAL(12,0)) * CAST(ry2 AS DECIMAL(12,0)))
                       AS sxy,
                   sum(CAST(rx2 AS DECIMAL(12,0)) * CAST(rx2 AS DECIMAL(12,0)))
                       AS sxx,
                   sum(CAST(ry2 AS DECIMAL(12,0)) * CAST(ry2 AS DECIMAL(12,0)))
                       AS syy
            FROM r GROUP BY series_key
        )
        SELECT series_key, n_days,
               round(CAST({_SP_NUM} AS DOUBLE)
                     / nullif(sqrt(CAST({_SP_DEN1} AS DOUBLE)
                                   * CAST({_SP_DEN2} AS DOUBLE)), 0.0),
                     6) + 0.0 AS rho_spearman
        FROM g
    """,
}
