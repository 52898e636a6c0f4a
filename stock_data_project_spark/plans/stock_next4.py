"""Stock-analytics keys built in r8 for the r9 driver window.

- ``aroon`` — Aroon up/down (n=14): 100·(n − periods-since-extreme)/n
  over a rows window. "Periods since the highest high" is an argmax
  POSITION inside the frame — computed as ``max(struct(value, rn))``
  (lexicographic struct comparison, ties → most recent; DuckDB's
  arg_max can't take a struct ORDER but plain max over a struct
  sorts identically in both engines), so the key is fully oracled
  with integer-exact arithmetic until the final ratio.
- ``cmf`` — Chaikin Money Flow (n=20): money-flow multiplier
  ((close−low)−(high−close))/(high−low) (flat bars contribute 0),
  volume-weighted and ratio-summed over the window.
- ``keltner`` — Keltner channel, SMA flavor (n=20, mult=2): center =
  SMA(typical price), band = ±2·SMA(true range). The EMA flavor
  belongs to the decimal-fold family (ema_cross); this is the
  window-only variant every engine can replay exactly.

Scale: one daily-bars groupBy + per-series rows windows — the
uniform-key window family (series count × days), same budget as
atr/stochastic/donchian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.series import daily_bars

_AROON_N = 14
_CMF_N = 20
_KC_N = 20
_KC_MULT = 2.0


def _bars_rn(spark: SparkSession, sf_dir: str):
    bars = daily_bars(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("series_key").orderBy("date")
    return bars.withColumn("rn", F.row_number().over(w).cast("int"))


def q_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-_AROON_N, 0)
    )
    # argmax POSITION = max of the (value, rn) struct, lexicographic:
    # ties → most recent. (arg_max/max_by can't take a struct ORDER
    # in DuckDB, but plain max OVER a struct sorts identically in
    # both engines.) For the low side, min over (low, -rn) makes the
    # tie also resolve to the most recent row.
    rn_hi = F.max(F.struct(F.col("high").alias("v"), F.col("rn").alias("r"))).over(
        w
    )["r"]
    rn_lo = -F.min(
        F.struct(F.col("low").alias("v"), (-F.col("rn")).alias("nr"))
    ).over(w)["nr"]
    return bars.select(
        "series_key",
        "date",
        F.round((F.lit(_AROON_N) - (F.col("rn") - rn_hi)) * 100.0 / _AROON_N, 6).alias(
            "aroon_up"
        ),
        F.round((F.lit(_AROON_N) - (F.col("rn") - rn_lo)) * 100.0 / _AROON_N, 6).alias(
            "aroon_down"
        ),
    )


def q_cmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    mfm = F.coalesce(
        F.try_divide(
            (F.col("close") - F.col("low")) - (F.col("high") - F.col("close")),
            F.col("high") - F.col("low"),
        ),
        F.lit(0.0),
    )
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_CMF_N - 1), 0)
    )
    return (
        bars.withColumn("_mfv", mfm * F.col("volume"))
        .select(
            "series_key",
            "date",
            F.round(
                F.sum("_mfv").over(w) / F.sum("volume").over(w), 6
            ).alias("cmf"),
        )
    )


def q_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wlag = Window.partitionBy("series_key").orderBy("rn")
    prev_close = F.lag("close").over(wlag)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    typical = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    base = bars.withColumn("_tr", F.coalesce(tr, F.col("high") - F.col("low"))).withColumn(
        "_tp", typical
    )
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_KC_N - 1), 0)
    )
    center = F.avg("_tp").over(w)
    atr = F.avg("_tr").over(w)
    return base.select(
        "series_key",
        "date",
        F.round(center, 6).alias("kc_center"),
        F.round(center + _KC_MULT * atr, 6).alias("kc_upper"),
        F.round(center - _KC_MULT * atr, 6).alias("kc_lower"),
    )


QUERIES_NEXT = {
    "aroon": q_aroon,
    "cmf": q_cmf,
    "keltner": q_keltner,
}

from stock_data_project_spark.plans.stock import _BARS as _FULL_BARS  # noqa: E402

_SEQ = f"""
{_FULL_BARS}, seq AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY series_key
                                      ORDER BY date) AS INT) AS rn
    FROM bars
)"""

ORACLE_NEXT = {
    "aroon": f"""
        WITH {_SEQ}
        SELECT series_key, date,
               round(({_AROON_N} - (rn - struct_extract(
                         max(struct_pack(v := high, r := rn)) OVER w, 'r')))
                     * 100.0 / {_AROON_N}, 6) AS aroon_up,
               round(({_AROON_N} - (rn + struct_extract(
                         min(struct_pack(v := low, nr := -rn)) OVER w, 'nr')))
                     * 100.0 / {_AROON_N}, 6) AS aroon_down
        FROM seq
        WINDOW w AS (PARTITION BY series_key ORDER BY rn
                     ROWS BETWEEN {_AROON_N} PRECEDING AND CURRENT ROW)
    """,
    "cmf": f"""
        WITH {_SEQ}, mf AS (
            SELECT *,
                   coalesce(((close - low) - (high - close))
                            / nullif(high - low, 0), 0.0) * volume AS mfv
            FROM seq
        )
        SELECT series_key, date,
               round(sum(mfv) OVER w / sum(volume) OVER w, 6) AS cmf
        FROM mf
        WINDOW w AS (PARTITION BY series_key ORDER BY rn
                     ROWS BETWEEN {_CMF_N - 1} PRECEDING AND CURRENT ROW)
    """,
    "keltner": f"""
        WITH {_SEQ}, trr AS (
            SELECT *,
                   (high + low + close) / 3.0 AS tp,
                   coalesce(greatest(high - low,
                                     abs(high - lag(close) OVER wl),
                                     abs(low - lag(close) OVER wl)),
                            high - low) AS tr
            FROM seq
            WINDOW wl AS (PARTITION BY series_key ORDER BY rn)
        )
        SELECT series_key, date,
               round(avg(tp) OVER w, 6) AS kc_center,
               round(avg(tp) OVER w + {_KC_MULT} * avg(tr) OVER w, 6)
                   AS kc_upper,
               round(avg(tp) OVER w - {_KC_MULT} * avg(tr) OVER w, 6)
                   AS kc_lower
        FROM trr
        WINDOW w AS (PARTITION BY series_key ORDER BY rn
                     ROWS BETWEEN {_KC_N - 1} PRECEDING AND CURRENT ROW)
    """,
}
