"""Stock-analytics keys built in r9, staged for the r11 window.

Reference parity note: the reference computes pct_change/rolling-std
derived metrics over daily bars (fetch_stocks.py L213-216); these
keys extend the same daily-bars indicator family the repo already
grades (atr/stochastic/cci/...), all FULLY oracled.

- ``ultimate_oscillator`` — Williams' Ultimate Oscillator over three
  horizons (7/14/28): buying pressure bp = close − min(low, prev
  close), true range tr = max(high, prev close) − min(low, prev
  close); UO = 100·(4·(Σbp7/Σtr7) + 2·(Σbp14/Σtr14) + Σbp28/Σtr28)/7.
  Window sums are the frame-ordered window-aggregate family (proven
  parity since r5's bollinger/rolling_volatility); flat horizons
  (Σtr = 0) yield NULL via try_divide / nullif on both engines.
  First row per series has no prev close → the NULL lag is absorbed
  by NULL-skipping least/greatest identically on both engines (Spark
  F.least/F.greatest and DuckDB least/greatest both skip NULL
  arguments), so the first row contributes bp = close − low and
  tr = high − low on both sides.

- ``vortex`` — Vortex Indicator (n=14): VM+ = |high − prev low|,
  VM− = |low − prev high|, VI± = Σ(VM±, 14) / Σ(TR, 14) with the
  standard Wilder true range. Same window-sum family; try_divide /
  nullif for flat windows.

- ``ichimoku`` — Ichimoku Kinko Hyo, scaled to the 30-day synthetic
  calendar (tenkan 5, kijun 10, senkou-B 20, displacement 10; the
  classic 9/26/52-on-26 ratios don't fit a 30-bar series — the
  PERIODS are parameters, the construction is the indicator):
  tenkan/kijun/senkou-B are (window-max(high) + window-min(low))/2
  midpoints (integer-exact extrema, division is the only float op);
  senkou A/B arrive displaced FORWARD by 10 bars (lag), chikou is
  close displaced BACKWARD (lead). NULL rows at the displaced edges
  are identical on both engines.

- ``heikin_ashi`` — Heikin-Ashi candle transform: ha_close =
  (o+h+l+c)/4 (row-local), ha_open = (prev ha_open + prev
  ha_close)/2 — a recurrence that REUSES its own output, i.e. the
  EMA boundary class (CLAUDE.md): run in DECIMAL(18,6) with per-step
  HALF_UP rounding (the trix/adx recipe), multiplying by the EXACT
  decimal constants 0.25/0.5 so no division ever enters the
  recurrence (DuckDB DECIMAL/DECIMAL division returns DOUBLE).
  ha_high/ha_low are row-local greatest/least in double over the
  decimal-cast carries.

Scale: all four are the daily-bars uniform-key window family
(series × days) — one groupBy(series, day) shuffle at any event
volume; heikin_ashi adds one grouped Arrow fold, O(days) sequential
per series (the decayed-revenue budget).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.plans.stock_next4 import _SEQ, _bars_rn

_SIX = Decimal("0.000001")

_UO_FAST, _UO_MID, _UO_SLOW = 7, 14, 28
_VI_N = 14
_TENKAN, _KIJUN, _SENKOU_B, _DISP = 5, 10, 20, 10


# ------------------------------------------------------ ultimate_oscillator


def q_ultimate_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")
    pc = F.lag("close").over(wl)
    bp = F.col("close") - F.least(F.col("low"), pc)
    tr = F.greatest(F.col("high"), pc) - F.least(F.col("low"), pc)
    base = bars.select("series_key", "date", "rn", bp.alias("bp"), tr.alias("tr"))

    def ratio(n: int):
        w = (
            Window.partitionBy("series_key")
            .orderBy("rn")
            .rowsBetween(-(n - 1), 0)
        )
        return F.try_divide(F.sum("bp").over(w), F.sum("tr").over(w))

    uo = (
        100.0
        * (4.0 * ratio(_UO_FAST) + 2.0 * ratio(_UO_MID) + ratio(_UO_SLOW))
        / 7.0
    )
    return base.select(
        "series_key", "date", (F.round(uo, 6) + 0.0).alias("uo")
    )


# ------------------------------------------------------------------ vortex


def q_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")
    pc = F.lag("close").over(wl)
    ph = F.lag("high").over(wl)
    pl = F.lag("low").over(wl)
    vmp = F.abs(F.col("high") - pl)
    vmm = F.abs(F.col("low") - ph)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    base = bars.select(
        "series_key",
        "date",
        "rn",
        vmp.alias("vmp"),
        vmm.alias("vmm"),
        tr.alias("tr"),
    )
    w = (
        Window.partitionBy("series_key")
        .orderBy("rn")
        .rowsBetween(-(_VI_N - 1), 0)
    )
    str_ = F.sum("tr").over(w)
    return base.select(
        "series_key",
        "date",
        (F.round(F.try_divide(F.sum("vmp").over(w), str_), 6) + 0.0).alias(
            "vi_plus"
        ),
        (F.round(F.try_divide(F.sum("vmm").over(w), str_), 6) + 0.0).alias(
            "vi_minus"
        ),
    )


# ---------------------------------------------------------------- ichimoku


def q_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars_rn(spark, sf_dir)
    wl = Window.partitionBy("series_key").orderBy("rn")

    def midpoint(n: int):
        w = (
            Window.partitionBy("series_key")
            .orderBy("rn")
            .rowsBetween(-(n - 1), 0)
        )
        return (F.max("high").over(w) + F.min("low").over(w)) / 2.0

    tenkan = midpoint(_TENKAN)
    kijun = midpoint(_KIJUN)
    base = bars.select(
        "series_key",
        "date",
        "rn",
        "close",
        tenkan.alias("_t"),
        kijun.alias("_k"),
        midpoint(_SENKOU_B).alias("_sb"),
    )
    return base.select(
        "series_key",
        "date",
        F.round("_t", 6).alias("tenkan"),
        F.round("_k", 6).alias("kijun"),
        F.round(F.lag((F.col("_t") + F.col("_k")) / 2.0, _DISP).over(wl), 6).alias(
            "senkou_a"
        ),
        F.round(F.lag("_sb", _DISP).over(wl), 6).alias("senkou_b"),
        F.round(F.lead("close", _DISP).over(wl), 6).alias("chikou"),
    )


# -------------------------------------------------------------- heikin_ashi

_HALF = Decimal("0.5")
_QUARTER = Decimal("0.25")


def q_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    bars = _bars_rn(spark, sf_dir).select(
        "series_key",
        "date",
        "rn",
        "high",
        "low",
        F.col("open").cast("decimal(18,6)").alias("o_d"),
        F.col("high").cast("decimal(18,6)").alias("h_d"),
        F.col("low").cast("decimal(18,6)").alias("l_d"),
        F.col("close").cast("decimal(18,6)").alias("c_d"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        ha_open = ha_close = None
        opens, closes = [], []
        for o, h, l, c in zip(pdf["o_d"], pdf["h_d"], pdf["l_d"], pdf["c_d"]):
            if ha_open is None:
                ha_open = ((o + c) * _HALF).quantize(_SIX, ROUND_HALF_UP)
            else:
                ha_open = ((ha_open + ha_close) * _HALF).quantize(
                    _SIX, ROUND_HALF_UP
                )
            ha_close = ((o + h + l + c) * _QUARTER).quantize(_SIX, ROUND_HALF_UP)
            opens.append(ha_open)
            closes.append(ha_close)
        return pdf.assign(ha_open_d=opens, ha_close_d=closes)[
            ["series_key", "date", "high", "low", "ha_open_d", "ha_close_d"]
        ]

    folded = bars.groupBy("series_key").applyInPandas(
        fold,
        "series_key string, date timestamp, high double, low double, "
        "ha_open_d decimal(18,6), ha_close_d decimal(18,6)",
    )
    hao = F.col("ha_open_d").cast("double")
    hac = F.col("ha_close_d").cast("double")
    return folded.select(
        "series_key",
        "date",
        F.round(hao, 6).alias("ha_open"),
        F.round(F.greatest(F.col("high"), hao, hac), 6).alias("ha_high"),
        F.round(F.least(F.col("low"), hao, hac), 6).alias("ha_low"),
        F.round(hac, 6).alias("ha_close"),
    )


# ------------------------------------------------------------ parabolic_sar

_PSAR_AF0 = Decimal("0.02")
_PSAR_AFMAX = Decimal("0.2")


def q_parabolic_sar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's Parabolic SAR — the BRANCHY stateful recurrence
    (trend flips, clamped step, accelerating factor) run entirely in
    exact decimal so both engines replay the identical trajectory:

    state at rn=2 (after two bars): trend = up iff close2 ≥ close1;
    ep/sar = the two bars' extreme pair; af = 0.02. Per step:
    sar_raw = round(sar + af·(ep − sar), 6); clamp against the two
    PRIOR lows (up) / highs (down); reversal when the new bar crosses
    the clamped sar → sar := old ep, ep := new extreme, af := 0.02;
    otherwise extend (new extreme bumps af by 0.02 up to 0.2). Every
    quantity is DECIMAL(18,6) (af exact 2dp), every product rounded
    per step — no division, no float: the heikin_ashi/trix recipe on
    a recurrence with four state variables and data-dependent
    branches. Emits (sar, trend) from rn=2."""
    import pandas as pd

    bars = _bars_rn(spark, sf_dir).select(
        "series_key",
        "date",
        "rn",
        F.col("high").cast("decimal(18,6)").alias("h_d"),
        F.col("low").cast("decimal(18,6)").alias("l_d"),
        F.col("close").cast("decimal(18,6)").alias("c_d"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        n = len(pdf)
        out_sar, out_trend, out_idx = [], [], []
        if n >= 2:
            h, l, c = pdf["h_d"], pdf["l_d"], pdf["c_d"]
            up = c[1] >= c[0]
            ep = max(h[0], h[1]) if up else min(l[0], l[1])
            sar = min(l[0], l[1]) if up else max(h[0], h[1])
            af = _PSAR_AF0
            out_sar.append(sar)
            out_trend.append(1 if up else -1)
            out_idx.append(1)
            for t in range(2, n):
                sar_raw = (sar + af * (ep - sar)).quantize(
                    _SIX, ROUND_HALF_UP
                )
                if up:
                    sar_c = min(sar_raw, l[t - 1], l[t - 2])
                    if l[t] < sar_c:  # reversal to down
                        up, sar, ep, af = False, ep, l[t], _PSAR_AF0
                    else:
                        sar = sar_c
                        if h[t] > ep:
                            ep, af = h[t], min(af + _PSAR_AF0, _PSAR_AFMAX)
                else:
                    sar_c = max(sar_raw, h[t - 1], h[t - 2])
                    if h[t] > sar_c:  # reversal to up
                        up, sar, ep, af = True, ep, h[t], _PSAR_AF0
                    else:
                        sar = sar_c
                        if l[t] < ep:
                            ep, af = l[t], min(af + _PSAR_AF0, _PSAR_AFMAX)
                out_sar.append(sar)
                out_trend.append(1 if up else -1)
                out_idx.append(t)
        sel = pdf.iloc[out_idx]
        return pd.DataFrame(
            {
                "series_key": sel["series_key"].values,
                "date": sel["date"].values,
                "psar_d": out_sar,
                "trend": out_trend,
            }
        )

    folded = bars.groupBy("series_key").applyInPandas(
        fold,
        "series_key string, date timestamp, psar_d decimal(18,6), trend int",
    )
    return folded.select(
        "series_key",
        "date",
        F.round(F.col("psar_d").cast("double"), 6).alias("psar"),
        "trend",
    )


QUERIES_NEXT = {
    "ultimate_oscillator": q_ultimate_oscillator,
    "vortex": q_vortex,
    "ichimoku": q_ichimoku,
    "heikin_ashi": q_heikin_ashi,
    "parabolic_sar": q_parabolic_sar,
}

_UO_RATIO = {
    n: (
        f"sum(bp) OVER (PARTITION BY series_key ORDER BY rn "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW) "
        f"/ nullif(sum(tr) OVER (PARTITION BY series_key ORDER BY rn "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW), 0)"
    )
    for n in (_UO_FAST, _UO_MID, _UO_SLOW)
}

# ha_close is row-local; ha_open is the decimal recurrence (trix
# recipe: multiply by EXACT decimal constants, never divide inside
# the recursion — DuckDB DECIMAL/DECIMAL division returns DOUBLE).
_HA_CLOSE = (
    "CAST(round((s.o_d + s.h_d + s.l_d + s.c_d) * CAST(0.25 AS DECIMAL(3,2)), 6)"
    " AS DECIMAL(18,6))"
)
_HA_OPEN_NEXT = (
    "CAST(round((r.ha_open_d + r.ha_close_d) * CAST(0.5 AS DECIMAL(2,1)), 6)"
    " AS DECIMAL(18,6))"
)

# ---- parabolic_sar oracle fragments (recursive CTE, 4 state vars)
_PS_RAW = "CAST(round(r.sar + r.af * (r.ep - r.sar), 6) AS DECIMAL(18,6))"
_PS_UP = f"least({_PS_RAW}, s.pl1, s.pl2)"
_PS_DN = f"greatest({_PS_RAW}, s.ph1, s.ph2)"
_PS_REV_UP = f"(s.l_d < {_PS_UP})"
_PS_REV_DN = f"(s.h_d > {_PS_DN})"
_PS_AF0 = "CAST(0.02 AS DECIMAL(18,6))"
_PS_BUMP = "CAST(least(r.af + CAST(0.02 AS DECIMAL(18,6)), CAST(0.2 AS DECIMAL(18,6))) AS DECIMAL(18,6))"

_PSAR_SQL = f"""
    WITH RECURSIVE {_SEQ}, sd AS (
        SELECT series_key, date, rn,
               CAST(high AS DECIMAL(18,6)) AS h_d,
               CAST(low AS DECIMAL(18,6)) AS l_d,
               CAST(close AS DECIMAL(18,6)) AS c_d,
               lag(CAST(low AS DECIMAL(18,6)), 1) OVER w AS pl1,
               lag(CAST(low AS DECIMAL(18,6)), 2) OVER w AS pl2,
               lag(CAST(high AS DECIMAL(18,6)), 1) OVER w AS ph1,
               lag(CAST(high AS DECIMAL(18,6)), 2) OVER w AS ph2,
               lag(CAST(close AS DECIMAL(18,6)), 1) OVER w AS pc1
        FROM seq
        WINDOW w AS (PARTITION BY series_key ORDER BY rn)
    ), rec(series_key, date, rn, trend, sar, ep, af) AS (
        SELECT series_key, date, rn,
               CASE WHEN c_d >= pc1 THEN 1 ELSE -1 END,
               CAST(CASE WHEN c_d >= pc1 THEN least(l_d, pl1)
                         ELSE greatest(h_d, ph1) END AS DECIMAL(18,6)),
               CAST(CASE WHEN c_d >= pc1 THEN greatest(h_d, ph1)
                         ELSE least(l_d, pl1) END AS DECIMAL(18,6)),
               {_PS_AF0}
        FROM sd WHERE rn = 2
        UNION ALL
        SELECT s.series_key, s.date, s.rn,
               CASE WHEN r.trend = 1
                    THEN CASE WHEN {_PS_REV_UP} THEN -1 ELSE 1 END
                    ELSE CASE WHEN {_PS_REV_DN} THEN 1 ELSE -1 END END,
               CAST(CASE WHEN r.trend = 1
                    THEN CASE WHEN {_PS_REV_UP} THEN r.ep ELSE {_PS_UP} END
                    ELSE CASE WHEN {_PS_REV_DN} THEN r.ep ELSE {_PS_DN} END
                    END AS DECIMAL(18,6)),
               CAST(CASE WHEN r.trend = 1
                    THEN CASE WHEN {_PS_REV_UP} THEN s.l_d
                              ELSE greatest(r.ep, s.h_d) END
                    ELSE CASE WHEN {_PS_REV_DN} THEN s.h_d
                              ELSE least(r.ep, s.l_d) END
                    END AS DECIMAL(18,6)),
               CAST(CASE WHEN r.trend = 1
                    THEN CASE WHEN {_PS_REV_UP} THEN {_PS_AF0}
                              WHEN s.h_d > r.ep THEN {_PS_BUMP}
                              ELSE r.af END
                    ELSE CASE WHEN {_PS_REV_DN} THEN {_PS_AF0}
                              WHEN s.l_d < r.ep THEN {_PS_BUMP}
                              ELSE r.af END
                    END AS DECIMAL(18,6))
        FROM rec r JOIN sd s
          ON s.series_key = r.series_key AND s.rn = r.rn + 1
    )
    SELECT series_key, date,
           round(CAST(sar AS DOUBLE), 6) AS psar,
           CAST(trend AS INT) AS trend
    FROM rec
"""

ORACLE_NEXT = {
    "parabolic_sar": _PSAR_SQL,
    "ultimate_oscillator": f"""
        WITH {_SEQ}, bt AS (
            SELECT series_key, date, rn,
                   close - least(low, lag(close) OVER w) AS bp,
                   greatest(high, lag(close) OVER w)
                       - least(low, lag(close) OVER w) AS tr
            FROM seq
            WINDOW w AS (PARTITION BY series_key ORDER BY rn)
        )
        SELECT series_key, date,
               round(100.0 * (4.0 * ({_UO_RATIO[_UO_FAST]})
                              + 2.0 * ({_UO_RATIO[_UO_MID]})
                              + ({_UO_RATIO[_UO_SLOW]})) / 7.0, 6) + 0.0 AS uo
        FROM bt
    """,
    "vortex": f"""
        WITH {_SEQ}, vm AS (
            SELECT series_key, date, rn,
                   abs(high - lag(low) OVER w) AS vmp,
                   abs(low - lag(high) OVER w) AS vmm,
                   greatest(high - low,
                            abs(high - lag(close) OVER w),
                            abs(low - lag(close) OVER w)) AS tr
            FROM seq
            WINDOW w AS (PARTITION BY series_key ORDER BY rn)
        )
        SELECT series_key, date,
               round(sum(vmp) OVER wn / nullif(sum(tr) OVER wn, 0), 6) + 0.0
                   AS vi_plus,
               round(sum(vmm) OVER wn / nullif(sum(tr) OVER wn, 0), 6) + 0.0
                   AS vi_minus
        FROM vm
        WINDOW wn AS (PARTITION BY series_key ORDER BY rn
                      ROWS BETWEEN {_VI_N - 1} PRECEDING AND CURRENT ROW)
    """,
    "ichimoku": f"""
        WITH {_SEQ}, mids AS (
            SELECT series_key, date, rn, close,
                   (max(high) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_TENKAN - 1} PRECEDING AND CURRENT ROW)
                    + min(low) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_TENKAN - 1} PRECEDING AND CURRENT ROW))
                   / 2.0 AS t,
                   (max(high) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_KIJUN - 1} PRECEDING AND CURRENT ROW)
                    + min(low) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_KIJUN - 1} PRECEDING AND CURRENT ROW))
                   / 2.0 AS k,
                   (max(high) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_SENKOU_B - 1} PRECEDING AND CURRENT ROW)
                    + min(low) OVER (PARTITION BY series_key ORDER BY rn
                        ROWS BETWEEN {_SENKOU_B - 1} PRECEDING AND CURRENT ROW))
                   / 2.0 AS sb
            FROM seq
        )
        SELECT series_key, date,
               round(t, 6) AS tenkan,
               round(k, 6) AS kijun,
               round(lag((t + k) / 2.0, {_DISP}) OVER w, 6) AS senkou_a,
               round(lag(sb, {_DISP}) OVER w, 6) AS senkou_b,
               round(lead(close, {_DISP}) OVER w, 6) AS chikou
        FROM mids
        WINDOW w AS (PARTITION BY series_key ORDER BY rn)
    """,
    "heikin_ashi": f"""
        WITH RECURSIVE {_SEQ}, sd AS (
            SELECT series_key, date, rn, high, low,
                   CAST(open AS DECIMAL(18,6)) AS o_d,
                   CAST(high AS DECIMAL(18,6)) AS h_d,
                   CAST(low AS DECIMAL(18,6)) AS l_d,
                   CAST(close AS DECIMAL(18,6)) AS c_d
            FROM seq
        ), rec(series_key, date, rn, high, low, ha_open_d, ha_close_d) AS (
            SELECT series_key, date, rn, high, low,
                   CAST(round((o_d + c_d) * CAST(0.5 AS DECIMAL(2,1)), 6)
                        AS DECIMAL(18,6)),
                   CAST(round((o_d + h_d + l_d + c_d)
                              * CAST(0.25 AS DECIMAL(3,2)), 6)
                        AS DECIMAL(18,6))
            FROM sd WHERE rn = 1
            UNION ALL
            SELECT s.series_key, s.date, s.rn, s.high, s.low,
                   {_HA_OPEN_NEXT}, {_HA_CLOSE}
            FROM rec r JOIN sd s
              ON s.series_key = r.series_key AND s.rn = r.rn + 1
        )
        SELECT series_key, date,
               round(CAST(ha_open_d AS DOUBLE), 6) AS ha_open,
               round(greatest(high, CAST(ha_open_d AS DOUBLE),
                              CAST(ha_close_d AS DOUBLE)), 6) AS ha_high,
               round(least(low, CAST(ha_open_d AS DOUBLE),
                           CAST(ha_close_d AS DOUBLE)), 6) AS ha_low,
               round(CAST(ha_close_d AS DOUBLE), 6) AS ha_close
        FROM rec
    """,
}
