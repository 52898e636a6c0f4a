"""Stock-analytics keys built in r9, staged for the r10 driver window.

- ``cci`` — Commodity Channel Index (n=20):
  (tp − SMA(tp)) / (0.015 · meandev) where meandev is the mean
  ABSOLUTE deviation of the window's typical prices from the CURRENT
  row's SMA. The deviation depends on the anchor row, so it is not a
  window aggregate of any per-row column — it's a bounded rn-range
  self-join (fan-out exactly n per row, the daily-bars grain keeps it
  tiny at any event volume), and the deviation average goes through
  6dp-rounded DECIMAL + the exact-integer HALF_UP mean
  (operators/rounding): a groupBy avg of doubles is summation-order-
  dependent across engines, unlike the frame-ordered window avgs the
  other indicators use. Flat windows (meandev = 0) yield NULL via
  try_divide/nullif on both engines; the ratio subtracts through
  zero → ``+ 0.0`` after the final round (the williams_r rule).

- ``force_index`` — Elder's Force Index, SMA flavor (n=13):
  fi = Δclose · volume, smoothed by a 13-row window average (the
  EMA flavor belongs to the decimal-fold family like ema_cross; the
  window variant is exactly engine-replayable). First row per series
  has no Δclose → NULL, and the window avg skips NULLs identically
  on both engines.

- ``ease_of_movement`` — Arms' EMV (n=14): distance moved = Δ of the
  high/low midpoint; box ratio = (volume / 1e8) / (high − low);
  EMV = distance/box, NULL on flat bars (try_divide / nullif), then
  a 14-row window average that skips the NULLs.

Scale: the force/EMV keys are the uniform-key window family
(series × days); cci adds one bounded ×n self-join at the same
daily-bars grain — all shapes hold at any raw event volume because
daily_bars aggregates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.plans.stock_next4 import _SEQ, _bars_rn

_CCI_N = 20
_FI_N = 13
_EOM_N = 14
_EOM_SCALE = 100000000.0  # the classic 1e8 volume normalizer


def q_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_CCI_N - 1), 0)
    )
    base = bars.select(
        "series_key",
        "date",
        "rn",
        ((F.col("high") + F.col("low") + F.col("close")) / 3.0).alias("tp"),
    ).withColumn("sma", F.avg("tp").over(w))
    wrows = base.select(
        "series_key", F.col("rn").alias("wrn"), F.col("tp").alias("wtp")
    )
    dev = (
        base.join(wrows, "series_key")
        .filter(
            (F.col("wrn") <= F.col("rn"))
            & (F.col("wrn") >= F.col("rn") - (_CCI_N - 1))
        )
        .groupBy("series_key", "date", "tp", "sma")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                F.round(F.abs(F.col("wtp") - F.col("sma")), 6).cast(
                    "decimal(18,6)"
                )
            ).alias("_dev_d"),
        )
        .withColumn("_units", (F.col("_dev_d") * 1000000).cast("long"))
        .withColumn("md", exact_avg6_expr("_units", "_n"))
    )
    return dev.select(
        "series_key",
        "date",
        (
            F.round(
                F.try_divide(F.col("tp") - F.col("sma"), 0.015 * F.col("md")), 6
            )
            + 0.0
        ).alias("cci"),
    )


def q_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")
    fi = (F.col("close") - F.lag("close").over(wl)) * F.col("volume")
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_FI_N - 1), 0)
    )
    return (
        bars.withColumn("_fi", fi)
        .select(
            "series_key",
            "date",
            (F.round(F.col("_fi"), 6) + 0.0).alias("force_raw"),
            (F.round(F.avg("_fi").over(w), 6) + 0.0).alias("force_sma"),
        )
    )


def q_ease_of_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")
    mid = (F.col("high") + F.col("low")) / 2.0
    dm = mid - F.lag(mid).over(wl)
    box = F.try_divide(F.col("volume") / _EOM_SCALE, F.col("high") - F.col("low"))
    emv = F.try_divide(dm, box)
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_EOM_N - 1), 0)
    )
    # EMV magnitudes reach ~1e9-1e10 (the 1e8 volume normalizer is
    # in the DENOMINATOR of the box ratio), where a 6dp rounding is
    # below the double's ulp and the engines' rounds diverge in the
    # last digit — the CLAUDE.md 2dp-for-~1e9 rule applies.
    return (
        bars.withColumn("_emv", emv)
        .select(
            "series_key",
            "date",
            (F.round(F.col("_emv"), 2) + 0.0).alias("emv"),
            (F.round(F.avg("_emv").over(w), 2) + 0.0).alias("eom_sma"),
        )
    )


QUERIES_NEXT = {
    "cci": q_cci,
    "force_index": q_force_index,
    "ease_of_movement": q_ease_of_movement,
}

_CCI_MD = exact_avg6_sql("CAST(sum(dev_d) * 1000000 AS BIGINT)", "count(*)")

ORACLE_NEXT = {
    "cci": f"""
        WITH {_SEQ}, tp AS (
            SELECT series_key, date, rn,
                   (high + low + close) / 3.0 AS tp,
                   avg((high + low + close) / 3.0) OVER (
                       PARTITION BY series_key ORDER BY rn
                       ROWS BETWEEN {_CCI_N - 1} PRECEDING AND CURRENT ROW
                   ) AS sma
            FROM seq
        ), dev AS (
            SELECT b.series_key, b.date, b.tp, b.sma,
                   CAST(round(abs(w.tp - b.sma), 6) AS DECIMAL(18,6)) AS dev_d
            FROM tp b JOIN tp w
              ON w.series_key = b.series_key
             AND w.rn <= b.rn AND w.rn >= b.rn - {_CCI_N - 1}
        ), md AS (
            SELECT series_key, date, tp, sma,
                   {_CCI_MD} AS md
            FROM dev GROUP BY series_key, date, tp, sma
        )
        SELECT series_key, date,
               round((tp - sma) / nullif(0.015 * md, 0), 6) + 0.0 AS cci
        FROM md
    """,
    "force_index": f"""
        WITH {_SEQ}, fi AS (
            SELECT series_key, date, rn,
                   (close - lag(close) OVER (PARTITION BY series_key
                                             ORDER BY rn)) * volume AS fi
            FROM seq
        )
        SELECT series_key, date,
               round(fi, 6) + 0.0 AS force_raw,
               round(avg(fi) OVER (PARTITION BY series_key ORDER BY rn
                                   ROWS BETWEEN {_FI_N - 1} PRECEDING
                                            AND CURRENT ROW), 6) + 0.0
                   AS force_sma
        FROM fi
    """,
    "ease_of_movement": f"""
        WITH {_SEQ}, emv AS (
            SELECT series_key, date, rn,
                   ((high + low) / 2.0
                    - lag((high + low) / 2.0) OVER (PARTITION BY series_key
                                                    ORDER BY rn))
                   / nullif((volume / {_EOM_SCALE}) / nullif(high - low, 0), 0)
                       AS emv
            FROM seq
        )
        SELECT series_key, date,
               round(emv, 2) + 0.0 AS emv,
               round(avg(emv) OVER (PARTITION BY series_key ORDER BY rn
                                    ROWS BETWEEN {_EOM_N - 1} PRECEDING
                                             AND CURRENT ROW), 2) + 0.0
                   AS eom_sma
        FROM emv
    """,
}
