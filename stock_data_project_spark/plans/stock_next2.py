"""Stock/time-series keys built in r5 for the r6 driver window.

Same discipline as stock_next.py (r4b→r5): implemented, registered in
``queries()`` immediately (since r5 every implemented key is
registered — staging is POSITION in the grade window, not absence),
parity-proven now by tests/test_next2_staged.py, debuting at the front
of r6's ``_GRADE_ORDER``.

Four keys extend the derived-metric family
(reference fetch_stocks.py:213-216; charted by streamlit/app.py):

- ``williams_r`` — Williams %R (stochastic %K mirrored to [-100, 0]).
- ``mfi`` — money-flow index: the volume-weighted RSI cousin; every
  term is a rolling sum of a row-local derived column, so the whole
  indicator rides the one per-key window shuffle.
- ``ulcer_index`` — downside-risk volatility (rolling-peak drawdown
  RMS), the decomposable member of the deviation-indicator family
  (mean-absolute-deviation indicators like CCI are NOT window-
  decomposable — documented in operators/indicators.py).
- ``linear_interp`` — the gap_fill key's missing half: linear
  interpolation between the previous and next observation on the
  calendar spine (gap_fill carries forward; interpolation needs the
  NEXT observation too, computed as a time-DESCENDING running
  ``last`` — the O(n) mirror of the forward carry, never an
  unboundedFollowing frame, which Spark executes O(n²) per key).

Scale: identical to the graded indicator family — one hash shuffle on
the series key, per-key sorted window state, zero UDFs, codegen
throughout. The spine join in linear_interp broadcasts nothing and
explodes only (series × calendar-day) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.indicators import (
    with_mfi,
    with_ulcer,
    with_williams_r,
)
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_bars(load_table(spark, sf_dir, "events"))


def q_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_williams_r(_bars(spark, sf_dir), window=14).select(
        "series_key", "date", "close", "williams_r"
    )


def q_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_mfi(_bars(spark, sf_dir), window=14).select(
        "series_key", "date", "close", "mfi"
    )


def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_ulcer(_bars(spark, sf_dir), window=14).select(
        "series_key", "date", "close", "dd_pct", "ulcer"
    )


def q_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine + LINEAR interpolation over the same sparse
    series gap_fill forward-fills (purchase days > 200). For each gap
    day: prev + (next − prev)·(t − t_prev)/(t_next − t_prev); leading
    gaps take the next observation, trailing gaps the prev. The
    "next" carry is a time-DESCENDING running last(ignorenulls) —
    same partitioning as the ascending pass, so both carries ride one
    shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    )
    bars = daily_bars(ev).select("series_key", "date", "close")
    bounds = bars.groupBy("series_key").agg(
        F.min("date").alias("mn"), F.max("date").alias("mx")
    )
    spine = bounds.select(
        "series_key",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("date"),
    )
    j = spine.join(bars, ["series_key", "date"], "left")

    w_asc = (
        Window.partitionBy("series_key")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_desc = (
        Window.partitionBy("series_key")
        .orderBy(F.col("date").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_date = F.when(F.col("close").isNotNull(), F.col("date"))
    prev_v = F.last("close", ignorenulls=True).over(w_asc)
    prev_t = F.last(obs_date, ignorenulls=True).over(w_asc)
    next_v = F.last("close", ignorenulls=True).over(w_desc)
    next_t = F.last(obs_date, ignorenulls=True).over(w_desc)

    t = F.unix_micros("date").cast("double")
    tp = F.unix_micros(prev_t).cast("double")
    tn = F.unix_micros(next_t).cast("double")
    frac = (t - tp) / F.nullif(tn - tp, F.lit(0.0))
    interp = (
        F.when(F.col("close").isNotNull(), F.col("close"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return j.select(
        "series_key",
        "date",
        F.col("close").alias("close_raw"),
        F.round(interp, 6).alias("interp"),
        F.col("close").isNull().alias("was_gap"),
    )


QUERIES_NEXT = {
    "williams_r": q_williams_r,
    "mfi": q_mfi,
    "ulcer_index": q_ulcer_index,
    "linear_interp": q_linear_interp,
}

_SPARSE = """
sparse AS (
    SELECT event_type AS series_key,
           date_trunc('day', ts) AS date,
           arg_max(value, ts) AS close
    FROM events
    WHERE event_type = 'purchase' AND value > 200
    GROUP BY 1, 2
),
bounds AS (
    SELECT series_key, min(date) AS mn, max(date) AS mx
    FROM sparse GROUP BY series_key
),
spine AS (
    SELECT series_key,
           unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS date
    FROM bounds
)"""

ORACLE_NEXT = {
    "williams_r": f"""
        WITH {_BARS}
        SELECT series_key, date, close,
               round(-100.0 * (hh - close) / nullif(hh - ll, 0.0), 6)
                   + 0.0 AS williams_r
        FROM (
            SELECT series_key, date, close,
                   max(high) OVER w AS hh,
                   min(low) OVER w AS ll
            FROM bars
            WINDOW w AS (PARTITION BY series_key ORDER BY date
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
    """,
    "mfi": f"""
        WITH {_BARS},
        tp AS (
            SELECT series_key, date, close, volume,
                   round((high + low + close) / 3.0, 6) AS tp
            FROM bars
        ),
        fl AS (
            SELECT series_key, date, close,
                   tp - lag(tp) OVER w AS d,
                   round(tp * volume, 6) AS flow
            FROM tp
            WINDOW w AS (PARTITION BY series_key ORDER BY date)
        ),
        sgn AS (
            SELECT series_key, date, close,
                   CASE WHEN d > 0 THEN flow ELSE 0.0 END AS pos,
                   CASE WHEN d < 0 THEN flow ELSE 0.0 END AS neg
            FROM fl
        )
        SELECT series_key, date, close,
               round(100.0 * sp / nullif(sp + sn, 0.0), 6) AS mfi
        FROM (
            SELECT series_key, date, close,
                   round(sum(pos) OVER w, 6) AS sp,
                   round(sum(neg) OVER w, 6) AS sn
            FROM sgn
            WINDOW w AS (PARTITION BY series_key ORDER BY date
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
    """,
    "ulcer_index": f"""
        WITH {_BARS},
        pk AS (
            SELECT series_key, date, close,
                   max(close) OVER w AS peak
            FROM bars
            WINDOW w AS (PARTITION BY series_key ORDER BY date
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        ),
        dd AS (
            SELECT series_key, date, close,
                   round(100.0 * (close - peak) / nullif(peak, 0.0), 6)
                       AS dd_pct
            FROM pk
        )
        SELECT series_key, date, close, dd_pct,
               round(sqrt(avg(dd_pct * dd_pct) OVER w), 6) AS ulcer
        FROM dd
        WINDOW w AS (PARTITION BY series_key ORDER BY date
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    "linear_interp": f"""
        WITH {_SPARSE},
        j AS (
            SELECT s.series_key, s.date, b.close
            FROM spine s LEFT JOIN sparse b
              ON s.series_key = b.series_key AND s.date = b.date
        ),
        carried AS (
            SELECT series_key, date, close,
                   last_value(close IGNORE NULLS) OVER wa AS prev_v,
                   last_value(CASE WHEN close IS NOT NULL THEN date END
                              IGNORE NULLS) OVER wa AS prev_t,
                   first_value(close IGNORE NULLS) OVER wd AS next_v,
                   first_value(CASE WHEN close IS NOT NULL THEN date END
                               IGNORE NULLS) OVER wd AS next_t
            FROM j
            WINDOW wa AS (PARTITION BY series_key ORDER BY date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wd AS (PARTITION BY series_key ORDER BY date
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT series_key, date, close AS close_raw,
               round(CASE
                   WHEN close IS NOT NULL THEN close
                   WHEN prev_v IS NULL THEN next_v
                   WHEN next_v IS NULL THEN prev_v
                   ELSE prev_v + (next_v - prev_v)
                        * (epoch_us(date) - epoch_us(prev_t))
                        / nullif(epoch_us(next_t) - epoch_us(prev_t), 0)
               END, 6) AS interp,
               close IS NULL AS was_gap
        FROM carried
    """,
}
