"""Stock-indicator keys staged for the r5 driver window.

Same staging discipline as plans/olap_next.py (r3b→r4) and
plans/llm_next.py: the r4 correctness window is exactly full, so
these seven debut in r5's ``_GRADE_ORDER`` head — registered-but-
ungraded keys are the defect the r2 verdict flagged. They are
parity-proven NOW by tests/test_stock_next.py (the driver-identical
value comparison at sf0.01) and the sf0.1 sweep.

The seven extend the reference's derived-metric family
(fetch_stocks.py:213-216 — daily return, rolling volatility; charted
by streamlit/app.py) with the next ring of dashboard indicators:
ATR, stochastic %K/%D, OBV, Donchian channel, rolling z-score
anomaly flags, floor pivot points, and per-day VWAP. All are
per-key window aggregates over the shared daily-bars rollup — the
same one-shuffle scale shape as the graded volatility family
(operators/indicators.py has the 100 TB argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.indicators import (
    with_atr,
    with_donchian,
    with_obv,
    with_pivot_points,
    with_stochastic,
    with_zscore,
)
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_bars(load_table(spark, sf_dir, "events"))


def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_atr(_bars(spark, sf_dir), window=14).select(
        "series_key", "date", "close", "true_range", "atr"
    )


def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_stochastic(_bars(spark, sf_dir), k_window=14, d_window=3).select(
        "series_key", "date", "close", "pct_k", "pct_d"
    )


def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_obv(_bars(spark, sf_dir)).select(
        "series_key", "date", "close", "volume", "obv"
    )


def q_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_donchian(_bars(spark, sf_dir), window=20).select(
        "series_key", "date", "close", "dc_upper", "dc_lower", "dc_mid"
    )


def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_zscore(_bars(spark, sf_dir), window=20, threshold=2.0).select(
        "series_key", "date", "close", "zscore", "is_anomaly"
    )


def q_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_pivot_points(_bars(spark, sf_dir)).select(
        "series_key", "date", "close", "pivot", "r1", "s1"
    )


def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (key, day) volume-weighted average price. ``events`` has no
    trade-size column, so the weight is a deterministic synthetic size
    derived from event_id (documented; the weighted-mean plumbing —
    one map-side-combinable shuffle, two partial sums — is the real
    operator). Weight ∈ [1, 97]."""
    ev = load_table(spark, sf_dir, "events")
    w = (F.col("event_id") % 97 + 1).alias("trade_size")
    return (
        ev.select(
            F.col("event_type").alias("series_key"),
            F.date_trunc("day", "ts").alias("date"),
            "value",
            w,
        )
        .groupBy("series_key", "date")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("trade_size")) / F.sum("trade_size"), 6
            ).alias("vwap"),
            F.sum("trade_size").alias("total_size"),
        )
    )


QUERIES_NEXT = {
    "atr": q_atr,
    "stochastic": q_stochastic,
    "obv": q_obv,
    "donchian": q_donchian,
    "zscore_anomaly": q_zscore_anomaly,
    "pivot_points": q_pivot_points,
    "vwap": q_vwap,
}

# Derived-from-rounded rule: any column computed FROM a rounded column
# (atr from true_range, pct_d from pct_k, is_anomaly from zscore) reads
# the rounded value on both sides, so the comparison stays exact.
ORACLE_NEXT = {
    "atr": f"""
        WITH {_BARS},
        tr AS (
            SELECT series_key, date, close,
                   round(CASE WHEN lag(close) OVER w IS NULL
                              THEN high - low
                              ELSE greatest(high - low,
                                            abs(high - lag(close) OVER w),
                                            abs(low - lag(close) OVER w))
                         END, 6) AS true_range
            FROM bars
            WINDOW w AS (PARTITION BY series_key ORDER BY date)
        )
        SELECT series_key, date, close, true_range,
               round(avg(true_range) OVER (PARTITION BY series_key ORDER BY date
                                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
                     6) AS atr
        FROM tr
    """,
    "stochastic": f"""
        WITH {_BARS},
        k AS (
            SELECT series_key, date, close,
                   round(100.0 * (close - min(low) OVER w14)
                         / nullif(max(high) OVER w14 - min(low) OVER w14, 0.0),
                         6) AS pct_k
            FROM bars
            WINDOW w14 AS (PARTITION BY series_key ORDER BY date
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT series_key, date, close, pct_k,
               round(avg(pct_k) OVER (PARTITION BY series_key ORDER BY date
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                     6) AS pct_d
        FROM k
    """,
    "obv": f"""
        WITH {_BARS},
        d AS (
            SELECT series_key, date, close, volume,
                   CASE WHEN lag(close) OVER w IS NULL THEN 0
                        WHEN close > lag(close) OVER w THEN volume
                        WHEN close < lag(close) OVER w THEN -volume
                        ELSE 0 END AS signed_vol
            FROM bars
            WINDOW w AS (PARTITION BY series_key ORDER BY date)
        )
        SELECT series_key, date, close, volume,
               CAST(sum(signed_vol) OVER (PARTITION BY series_key ORDER BY date
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
                    AS BIGINT) AS obv
        FROM d
    """,
    "donchian": f"""
        WITH {_BARS}
        SELECT series_key, date, close,
               max(high) OVER w20 AS dc_upper,
               min(low) OVER w20 AS dc_lower,
               round((max(high) OVER w20 + min(low) OVER w20) / 2.0, 6) AS dc_mid
        FROM bars
        WINDOW w20 AS (PARTITION BY series_key ORDER BY date
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    "zscore_anomaly": f"""
        WITH {_BARS},
        z AS (
            SELECT series_key, date, close,
                   round((close - avg(close) OVER w20)
                         / nullif(CASE WHEN count(close) OVER w20 >= 20
                                       THEN stddev_samp(close) OVER w20 END, 0.0),
                         6) AS zscore
            FROM bars
            WINDOW w20 AS (PARTITION BY series_key ORDER BY date
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT series_key, date, close, zscore,
               CASE WHEN zscore IS NOT NULL THEN abs(zscore) > 2.0 END AS is_anomaly
        FROM z
    """,
    "pivot_points": f"""
        WITH {_BARS},
        p AS (
            SELECT series_key, date, close,
                   (lag(high) OVER w + lag(low) OVER w + lag(close) OVER w) / 3.0 AS praw,
                   lag(high) OVER w AS ph,
                   lag(low) OVER w AS pl
            FROM bars
            WINDOW w AS (PARTITION BY series_key ORDER BY date)
        )
        SELECT series_key, date, close,
               round(praw, 6) AS pivot,
               round(2.0 * praw - pl, 6) AS r1,
               round(2.0 * praw - ph, 6) AS s1
        FROM p
    """,
    "vwap": """
        SELECT event_type AS series_key,
               date_trunc('day', ts) AS date,
               round(sum(value * (event_id % 97 + 1))
                     / sum(event_id % 97 + 1), 6) AS vwap,
               CAST(sum(event_id % 97 + 1) AS BIGINT) AS total_size
        FROM events
        GROUP BY 1, 2
    """,
}
