"""Stock-analytics keys built in r8 for the r9 driver window — the
Wilder/EMA recurrence family made FULLY ORACLED.

``wilder_rsi`` and ``macd`` have been rows-only since r2: an
EMA-style carry reuses its own rounded output, so double arithmetic
lands on rounding boundaries within ~20 steps (CLAUDE.md). The
``sql_decayed_revenue`` recipe removes the boundary class entirely —
run the recurrence in DECIMAL(18,6) with per-step HALF_UP rounding
(exact, order-independent, identical in Python decimal / Spark
DECIMAL / DuckDB DECIMAL) and cast to DOUBLE only at the end. These
two keys apply that recipe to real indicators with EXACT decimal
smoothing constants (α = 2/(n+1) or 1/n chosen so α is a one-digit
decimal — the multiplier quantization IS the indicator definition
here, documented):

- ``trix`` — triple-EMA rate of change, n=9 → α = 0.2 exactly.
  Three chained decimal EMA recurrences per series (one grouped
  Arrow fold, O(days) sequential work per series, embarrassingly
  parallel across series); the final 1-day ROC is double math over
  identical decimal-cast inputs on both engines. ROC subtracts
  through zero → ``+ 0.0`` after the final round on BOTH sides (the
  williams_r signed-zero rule).
- ``adx`` — Welles Wilder's directional system (+DI/−DI/DX/ADX),
  n=10 → Wilder α = 1/n = 0.1 exactly. Two decimal recurrences
  (smoothed TR/+DM/−DM, then ADX = smoothed DX) with the DI/DX
  ratio layer BETWEEN them computed by each engine's native
  round(double, 6) — divisions never enter a recurrence, so every
  cross-engine rounding is the proven-parity operation.

Scale: daily-bars groupBy + per-series sequential folds — the
decayed-revenue budget: one shuffle on series_key, O(days) per
group. The recursive-CTE formulation (the oracle) would schedule
one UnionLoop join job PER DAY on Spark (CLAUDE.md); the grouped
fold replaces that with a single stage.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.plans.stock_next4 import _SEQ, _bars_rn

_SIX = Decimal("0.000001")


def _ema_step(carry: Decimal, x: Decimal, alpha: Decimal) -> Decimal:
    """carry' = round((1−α)·carry + α·x, 6) — exact decimal, HALF_UP
    like both engines' DECIMAL round, so the trajectory is
    engine-deterministic (sql_api.q_sql_decayed_revenue's recipe)."""
    return (carry * (1 - alpha) + x * alpha).quantize(_SIX, ROUND_HALF_UP)


# ------------------------------------------------------------------ trix

_TRIX_ALPHA = Decimal("0.2")  # n=9 → 2/(n+1) = 0.2, exact in decimal


def q_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    bars = _bars_rn(spark, sf_dir).select(
        "series_key", "date", "rn", F.col("close").cast("decimal(18,6)").alias("c")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        e1 = e2 = e3 = None
        out = []
        for c in pdf["c"]:  # arrives as decimal.Decimal
            if e1 is None:
                e1 = e2 = e3 = c
            else:
                e1 = _ema_step(e1, c, _TRIX_ALPHA)
                e2 = _ema_step(e2, e1, _TRIX_ALPHA)
                e3 = _ema_step(e3, e2, _TRIX_ALPHA)
            out.append(e3)
        return pdf.assign(e3=out)[["series_key", "date", "rn", "e3"]]

    folded = bars.groupBy("series_key").applyInPandas(
        fold, "series_key string, date timestamp, rn int, e3 decimal(18,6)"
    )
    w = Window.partitionBy("series_key").orderBy("rn")
    e3d = F.col("e3").cast("double")
    prev = F.lag(e3d).over(w)
    return folded.select(
        "series_key",
        "date",
        # ROC subtracts through zero: a ~−1e-9 move rounds to −0.0 in
        # DuckDB (std-round keeps the sign) but +0.0 via Spark's
        # BigDecimal — normalize AFTER the round on both sides.
        # try_divide: if a smoothed e3 ever hits 0 (all-zero-close
        # prefix), Spark double 0/0 is NaN while DuckDB /0 is NULL —
        # NULL on both sides, matching the adx DI/DX layer (oracle
        # divides by nullif(prev, 0)).
        (F.round(F.try_divide(100.0 * (e3d - prev), prev), 6) + 0.0).alias("trix"),
    )


_TRIX_E1 = (
    "CAST(round(r.e1 * CAST(0.8 AS DECIMAL(2,1))"
    " + s.c * CAST(0.2 AS DECIMAL(2,1)), 6) AS DECIMAL(18,6))"
)
_TRIX_E2 = (
    "CAST(round(r.e2 * CAST(0.8 AS DECIMAL(2,1))"
    f" + {_TRIX_E1} * CAST(0.2 AS DECIMAL(2,1)), 6) AS DECIMAL(18,6))"
)
_TRIX_E3 = (
    "CAST(round(r.e3 * CAST(0.8 AS DECIMAL(2,1))"
    f" + {_TRIX_E2} * CAST(0.2 AS DECIMAL(2,1)), 6) AS DECIMAL(18,6))"
)

_TRIX_SQL = f"""
    WITH RECURSIVE {_SEQ}, sd AS (
        SELECT series_key, date, rn, CAST(close AS DECIMAL(18,6)) AS c
        FROM seq
    ), rec(series_key, date, rn, e1, e2, e3) AS (
        SELECT series_key, date, rn, c, c, c FROM sd WHERE rn = 1
        UNION ALL
        SELECT s.series_key, s.date, s.rn, {_TRIX_E1}, {_TRIX_E2}, {_TRIX_E3}
        FROM rec r JOIN sd s
          ON s.series_key = r.series_key AND s.rn = r.rn + 1
    )
    SELECT series_key, date,
           round(100.0 * (CAST(e3 AS DOUBLE) - lag(CAST(e3 AS DOUBLE)) OVER w)
                 / nullif(lag(CAST(e3 AS DOUBLE)) OVER w, 0), 6) + 0.0 AS trix
    FROM rec
    WINDOW w AS (PARTITION BY series_key ORDER BY rn)
"""


# ------------------------------------------------------------------- adx

_ADX_ALPHA = Decimal("0.1")  # Wilder n=10 → α = 1/n = 0.1, exact


def q_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")
    prev_close = F.lag("close").over(wl)
    prev_high = F.lag("high").over(wl)
    prev_low = F.lag("low").over(wl)
    tr = F.coalesce(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        ),
        F.col("high") - F.col("low"),
    )
    up = F.col("high") - prev_high
    dn = prev_low - F.col("low")
    pdm = F.when((up > dn) & (up > 0), up).otherwise(F.lit(0.0))
    mdm = F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0.0))
    base = bars.select(
        "series_key",
        "date",
        "rn",
        F.round(tr, 6).cast("decimal(18,6)").alias("tr_d"),
        F.round(pdm, 6).cast("decimal(18,6)").alias("pdm_d"),
        F.round(mdm, 6).cast("decimal(18,6)").alias("mdm_d"),
    )

    def fold1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        s_tr = s_pdm = s_mdm = None
        rows = []
        for tr_v, pdm_v, mdm_v in zip(pdf["tr_d"], pdf["pdm_d"], pdf["mdm_d"]):
            if s_tr is None:
                s_tr, s_pdm, s_mdm = tr_v, pdm_v, mdm_v
            else:
                s_tr = _ema_step(s_tr, tr_v, _ADX_ALPHA)
                s_pdm = _ema_step(s_pdm, pdm_v, _ADX_ALPHA)
                s_mdm = _ema_step(s_mdm, mdm_v, _ADX_ALPHA)
            rows.append((s_tr, s_pdm, s_mdm))
        pdf = pdf.assign(
            s_tr=[r[0] for r in rows],
            s_pdm=[r[1] for r in rows],
            s_mdm=[r[2] for r in rows],
        )
        return pdf[["series_key", "date", "rn", "s_tr", "s_pdm", "s_mdm"]]

    smoothed = base.groupBy("series_key").applyInPandas(
        fold1,
        "series_key string, date timestamp, rn int, "
        "s_tr decimal(18,6), s_pdm decimal(18,6), s_mdm decimal(18,6)",
    )

    # DI / DX layer: double math over identical decimal-cast inputs,
    # rounded by each engine's NATIVE round (the proven-parity op) —
    # divisions stay OUT of the recurrences.
    s_tr_dbl = F.col("s_tr").cast("double")
    pdi = F.round(
        F.coalesce(F.try_divide(100.0 * F.col("s_pdm").cast("double"), s_tr_dbl), F.lit(0.0)),
        6,
    )
    mdi = F.round(
        F.coalesce(F.try_divide(100.0 * F.col("s_mdm").cast("double"), s_tr_dbl), F.lit(0.0)),
        6,
    )
    di = smoothed.select("series_key", "date", "rn", pdi.alias("pdi"), mdi.alias("mdi"))
    dx = F.round(
        F.coalesce(
            F.try_divide(
                100.0 * F.abs(F.col("pdi") - F.col("mdi")), F.col("pdi") + F.col("mdi")
            ),
            F.lit(0.0),
        ),
        6,
    )
    with_dx = di.select(
        "series_key", "date", "rn", "pdi", "mdi", dx.alias("dx")
    ).withColumn("dx_d", F.col("dx").cast("decimal(18,6)"))

    def fold2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        carry = None
        out = []
        for d in pdf["dx_d"]:
            carry = d if carry is None else _ema_step(carry, d, _ADX_ALPHA)
            out.append(carry)
        return pdf.assign(adx=out)[
            ["series_key", "date", "rn", "pdi", "mdi", "dx", "adx"]
        ]

    folded = with_dx.groupBy("series_key").applyInPandas(
        fold2,
        "series_key string, date timestamp, rn int, "
        "pdi double, mdi double, dx double, adx decimal(18,6)",
    )
    return folded.select(
        "series_key", "date", "pdi", "mdi", "dx", F.col("adx").cast("double").alias("adx")
    )


def _wilder(carry: str, x: str) -> str:
    return (
        f"CAST(round({carry} * CAST(0.9 AS DECIMAL(2,1))"
        f" + {x} * CAST(0.1 AS DECIMAL(2,1)), 6) AS DECIMAL(18,6))"
    )


_ADX_SQL = f"""
    WITH RECURSIVE {_SEQ}, base AS (
        SELECT series_key, date, rn,
               CAST(round(coalesce(greatest(high - low,
                                            abs(high - lag(close) OVER wl),
                                            abs(low - lag(close) OVER wl)),
                                   high - low), 6) AS DECIMAL(18,6)) AS tr_d,
               CAST(round(CASE WHEN (high - lag(high) OVER wl)
                                    > (lag(low) OVER wl - low)
                                AND (high - lag(high) OVER wl) > 0
                               THEN high - lag(high) OVER wl
                               ELSE 0.0 END, 6) AS DECIMAL(18,6)) AS pdm_d,
               CAST(round(CASE WHEN (lag(low) OVER wl - low)
                                    > (high - lag(high) OVER wl)
                                AND (lag(low) OVER wl - low) > 0
                               THEN lag(low) OVER wl - low
                               ELSE 0.0 END, 6) AS DECIMAL(18,6)) AS mdm_d
        FROM seq
        WINDOW wl AS (PARTITION BY series_key ORDER BY rn)
    ), rec1(series_key, date, rn, s_tr, s_pdm, s_mdm) AS (
        SELECT series_key, date, rn, tr_d, pdm_d, mdm_d FROM base WHERE rn = 1
        UNION ALL
        SELECT b.series_key, b.date, b.rn,
               {_wilder('r.s_tr', 'b.tr_d')},
               {_wilder('r.s_pdm', 'b.pdm_d')},
               {_wilder('r.s_mdm', 'b.mdm_d')}
        FROM rec1 r JOIN base b
          ON b.series_key = r.series_key AND b.rn = r.rn + 1
    ), di AS (
        SELECT series_key, date, rn,
               round(coalesce(100.0 * CAST(s_pdm AS DOUBLE)
                              / nullif(CAST(s_tr AS DOUBLE), 0), 0.0), 6) AS pdi,
               round(coalesce(100.0 * CAST(s_mdm AS DOUBLE)
                              / nullif(CAST(s_tr AS DOUBLE), 0), 0.0), 6) AS mdi
        FROM rec1
    ), dxt AS (
        SELECT *, round(coalesce(100.0 * abs(pdi - mdi)
                                 / nullif(pdi + mdi, 0), 0.0), 6) AS dx
        FROM di
    ), dxd AS (
        SELECT *, CAST(dx AS DECIMAL(18,6)) AS dx_d FROM dxt
    ), rec2(series_key, date, rn, pdi, mdi, dx, adx) AS (
        SELECT series_key, date, rn, pdi, mdi, dx, dx_d FROM dxd WHERE rn = 1
        UNION ALL
        SELECT d.series_key, d.date, d.rn, d.pdi, d.mdi, d.dx,
               {_wilder('r.adx', 'd.dx_d')}
        FROM rec2 r JOIN dxd d
          ON d.series_key = r.series_key AND d.rn = r.rn + 1
    )
    SELECT series_key, date, pdi, mdi, dx, CAST(adx AS DOUBLE) AS adx
    FROM rec2
"""


QUERIES_NEXT = {
    "trix": q_trix,
    "adx": q_adx,
}

ORACLE_NEXT = {
    "trix": _TRIX_SQL,
    "adx": _ADX_SQL,
}
