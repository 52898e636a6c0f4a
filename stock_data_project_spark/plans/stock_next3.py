"""Stock-analytics keys built in r6 for the r7 driver window.

- ``ema_cross`` — the FIRST fully-oracled EMA-class indicator: the
  sql_decayed_revenue pattern (exact-decimal recurrence, grouped
  applyInPandas fold shipped, recursive-CTE oracle) applied to the
  indicator family. macd/wilder_rsi stay rows-only because their
  reference semantics are double EMAs (pandas parity); this key runs
  fast (α=0.2) and slow (α=0.05) EMAs of the daily close in
  DECIMAL(18,6) with per-step HALF-UP rounding, so DuckDB replays
  the identical trajectory with one recursive CTE carrying both
  carries. Crossover signals (+1 golden, −1 death) fall out of exact
  decimal sign comparisons — no float-boundary flake possible.
- ``roc_momentum`` — n-day rate of change and momentum: one lag
  window per series, try_divide/nullif for the zero-close guard
  (the pct_change idiom), fully oracled.

Scale: both are one groupBy (daily bars) + one per-series pass; the
fold's state is O(1) per series and series count bounds parallelism
exactly as the other indicator keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.series import daily_bars

_FAST = "0.2"
_SLOW = "0.05"
_ROC_N = 10


def q_ema_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow decimal EMAs of the daily close + crossover signal
    (see module doc)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    bars = daily_bars(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("series_key").orderBy("date")
    # NULL series AND NULL closes excluded on BOTH sides: the
    # oracle's recursive join never matches a NULL series (keeping
    # only its anchor row while the fold kept the trajectory), and a
    # NULL close would TypeError inside the decimal fold where the
    # oracle's SQL arithmetic silently propagates NULL — filter both
    # before rn so ranks stay dense and identical (r6 review findings)
    daily = bars.filter(
        F.col("series_key").isNotNull() & F.col("close").isNotNull()
    ).select(
        "series_key",
        "date",
        F.row_number().over(w).cast("int").alias("rn"),
        F.round(F.col("close"), 6).cast("decimal(18,6)").alias("close"),
    )
    six = Decimal("0.000001")
    a_f, b_f = Decimal(_FAST), 1 - Decimal(_FAST)
    a_s, b_s = Decimal(_SLOW), 1 - Decimal(_SLOW)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        fast = slow = None
        prev_sign = None
        fasts, slows, signals = [], [], []
        for c in pdf["close"]:  # decimal.Decimal
            if fast is None:
                fast, slow = c, c
            else:
                fast = (a_f * c + b_f * fast).quantize(six, ROUND_HALF_UP)
                slow = (a_s * c + b_s * slow).quantize(six, ROUND_HALF_UP)
            sign = 1 if fast > slow else (-1 if fast < slow else 0)
            signals.append(
                sign if (prev_sign is not None and sign != prev_sign) else 0
            )
            prev_sign = sign
            fasts.append(fast)
            slows.append(slow)
        return pdf.assign(ema_fast=fasts, ema_slow=slows, cross_signal=signals)[
            ["series_key", "date", "rn", "ema_fast", "ema_slow", "cross_signal"]
        ]

    folded = daily.groupBy("series_key").applyInPandas(
        fold,
        "series_key string, date timestamp, rn int,"
        " ema_fast decimal(18,6), ema_slow decimal(18,6), cross_signal int",
    )
    return folded.select(
        "series_key",
        "date",
        "rn",
        F.col("ema_fast").cast("double").alias("ema_fast"),
        F.col("ema_slow").cast("double").alias("ema_slow"),
        "cross_signal",
    )


def q_roc_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-day rate of change (%) and momentum of the daily close."""
    bars = daily_bars(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("series_key").orderBy("date")
    prev = F.lag("close", _ROC_N).over(w)
    return bars.select(
        "series_key",
        "date",
        "close",
        F.round(F.try_divide((F.col("close") - prev) * 100.0, prev), 6).alias(
            "roc"
        ),
        F.round(F.col("close") - prev, 6).alias("momentum"),
    )


QUERIES_NEXT = {
    "ema_cross": q_ema_cross,
    "roc_momentum": q_roc_momentum,
}

# ema's close-only bars (NULL series/closes excluded to mirror the
# fold's filter); roc reuses the FULL shared bars CTE from stock.py —
# one copy of the daily_bars mirror, per the single-implementation
# rule (r6 review finding). Import is safe: plans/__init__ always
# initializes stock (which binds _BARS at its top) before any path
# can reach this module.
from stock_data_project_spark.plans.stock import _BARS as _FULL_BARS  # noqa: E402

_CLOSE_BARS = """
bars AS (
    SELECT event_type AS series_key,
           date_trunc('day', ts) AS date,
           arg_max(value, ts) AS close
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY 1, 2
)"""

ORACLE_NEXT = {
    "ema_cross": f"""
        WITH RECURSIVE {_CLOSE_BARS}, seq AS (
            SELECT series_key, date,
                   CAST(row_number() OVER (PARTITION BY series_key
                                           ORDER BY date) AS INT) AS rn,
                   CAST(round(close, 6) AS DECIMAL(18,6)) AS close
            FROM bars
            WHERE close IS NOT NULL
        ), rec(series_key, date, rn, fast, slow) AS (
            SELECT series_key, date, rn, close, close FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.series_key, s.date, s.rn,
                   CAST(round(CAST({_FAST} AS DECIMAL(2,1)) * s.close
                              + CAST(0.8 AS DECIMAL(2,1)) * r.fast, 6)
                        AS DECIMAL(18,6)),
                   CAST(round(CAST({_SLOW} AS DECIMAL(3,2)) * s.close
                              + CAST(0.95 AS DECIMAL(3,2)) * r.slow, 6)
                        AS DECIMAL(18,6))
            FROM rec r JOIN seq s
              ON s.series_key = r.series_key AND s.rn = r.rn + 1
        ), signed AS (
            SELECT series_key, date, rn, fast, slow,
                   CASE WHEN fast > slow THEN 1
                        WHEN fast < slow THEN -1 ELSE 0 END AS sign
            FROM rec
        )
        SELECT series_key, date, rn,
               CAST(fast AS DOUBLE) AS ema_fast,
               CAST(slow AS DOUBLE) AS ema_slow,
               CAST(CASE WHEN lag(sign) OVER w IS NOT NULL
                          AND sign <> lag(sign) OVER w
                         THEN sign ELSE 0 END AS INT) AS cross_signal
        FROM signed
        WINDOW w AS (PARTITION BY series_key ORDER BY rn)
    """,
    "roc_momentum": f"""
        WITH {_FULL_BARS}
        SELECT series_key, date, close,
               round((close - lag(close, {_ROC_N}) OVER w) * 100.0
                     / nullif(lag(close, {_ROC_N}) OVER w, 0), 6) AS roc,
               round(close - lag(close, {_ROC_N}) OVER w, 6) AS momentum
        FROM bars
        WINDOW w AS (PARTITION BY series_key ORDER BY date)
    """,
}
