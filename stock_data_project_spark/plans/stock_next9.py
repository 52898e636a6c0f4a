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

``holt_winters`` — additive Holt–Winters triple exponential smoothing
(level + trend + weekly seasonal, period 7), completing the
forecasting ladder after holt_forecast. The recurrence REUSES its own
output three ways (the EMA boundary class), so it runs in
DECIMAL(18,6) with per-step HALF_UP quantize and exact decimal
constants (α=0.2, β=0.1, γ=0.3 — no division inside the recursion):

    l_t = α(x_t − s_{t−7}) + (1−α)(l+b)
    b_t = β(l_t − l) + (1−β)b
    s_t = γ(x_t − l_t) + (1−γ)s_{t−7}
    fitted_t = l + b + s_{t−7}       (the one-step-ahead forecast)

Init: l₇ = exact-integer HALF_UP mean of the first 7 closes (the
operators/rounding identity replicated in Python integers — NEVER
Python Decimal division, whose 28-significant-digit context would
double-round), b₇ = 0, s_i = x_i − l₇; emission starts at rn = 8 and
series shorter than 8 bars emit nothing (both engines).

The oracle replays the fold as a recursive CTE whose seasonal state
is a 7-column SHIFT REGISTER (sl1 = s_{t−7} consumed each step, the
new s_t appended at slot 7) — constant column count, no array
indexing, no CASE ladder; every state expression CAST back to
DECIMAL(18,6) per the cusum rule (DuckDB silently degrades a widening
recursive union to DOUBLE). Spark side is the grouped applyInPandas
exact-decimal fold (holt_forecast's shape plus the seasonal deque).

Scale shape: one applyInPandas pass per series, state O(period);
the recursive oracle is test-bound (30-step depth), not the engine
path.

``kendall_tau`` — Kendall's τ-b rank correlation between close and
volume per series, the pairwise complement to spearman_corr (τ is
the probability-of-concordance estimator; ρ the rank-linear one) and
ENTIRELY integer until the last expression: concordant/discordant
pair counts from the theil_sen-shaped per-series pair join (sign
CASE, ties on either variable contribute neither), tie corrections
tied-pair counts n₁ (x-ties) and n₂ (y-ties) from the SAME pair
set, τ_b = (C − D)/√((n₀−n₁)(n₀−n₂)) with the product in scale-0
DECIMAL ((19,0)² — exact on both engines) and one double
sqrt/division (identical shape), rounded + sign-normalized;
all-tied degenerate series NULL via nullif. Pairs come from
``operators/pairs.series_pairs``: exact C(n,2) at graded sizes
(tied-pair counts then equal the global Σt(t−1)/2 the oracle
computes, integer-for-integer), deterministic hash-sampled subset
past EXACT_MAX rows (the consistent sample estimator of τ_b) —
O(n·m) per series at scale, not O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.pairs import series_pairs
from stock_data_project_spark.operators.rounding import exact_avg6_sql
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


from decimal import ROUND_HALF_UP, Decimal

_SIX = Decimal("0.000001")
_HW_P = 7
_HW_A, _HW_1A = Decimal("0.2"), Decimal("0.8")
_HW_B, _HW_1B = Decimal("0.1"), Decimal("0.9")
_HW_G, _HW_1G = Decimal("0.3"), Decimal("0.7")

_HW_COLS = ["series_key", "date", "lvl_d", "tr_d", "seas_d", "fit_d"]


def _hw_fold(pdf):
    """Per-series exact-decimal Holt–Winters fold (module-level so
    tests can drive it on constructed frames). Series shorter than
    period+1 emit nothing — the CTE seed needs 7 rows and emission
    starts at rn 8."""
    import pandas as pd

    pdf = pdf.sort_values("rn")
    if len(pdf) < _HW_P + 1:
        # empty output must KEEP the input's column dtypes: a naive
        # pd.DataFrame of empty lists types every column float64 and
        # Arrow cannot cast an empty float64 to timestamp/decimal
        # (the codified empty-output class, here for scalar columns)
        z = pdf.head(0)
        return pd.DataFrame(
            {
                "series_key": z["series_key"],
                "date": z["date"],
                "lvl_d": z["c_d"],
                "tr_d": z["c_d"],
                "seas_d": z["c_d"],
                "fit_d": z["c_d"],
            }
        )
    cs = list(pdf["c_d"])
    units = sum(int(c * 1_000_000) for c in cs[:_HW_P])
    # sign-safe exact HALF_UP(units/7) — the operators/rounding identity
    if units < 0:
        l_units = -((-2 * units + _HW_P) // (2 * _HW_P))
    else:
        l_units = (2 * units + _HW_P) // (2 * _HW_P)
    lvl = (Decimal(l_units) / Decimal(1_000_000)).quantize(_SIX)
    tr = Decimal("0.000000")
    seas = [(c - lvl).quantize(_SIX) for c in cs[:_HW_P]]
    rows = []
    tail = pdf.iloc[_HW_P:]
    for sk, date, c in zip(tail["series_key"], tail["date"], tail["c_d"]):
        sa = seas.pop(0)
        fit = (lvl + tr + sa).quantize(_SIX)
        new_l = (_HW_A * (c - sa) + _HW_1A * (lvl + tr)).quantize(
            _SIX, ROUND_HALF_UP
        )
        new_b = (_HW_B * (new_l - lvl) + _HW_1B * tr).quantize(
            _SIX, ROUND_HALF_UP
        )
        new_s = (_HW_G * (c - new_l) + _HW_1G * sa).quantize(
            _SIX, ROUND_HALF_UP
        )
        seas.append(new_s)
        lvl, tr = new_l, new_b
        rows.append((sk, date, lvl, tr, new_s, fit))
    return pd.DataFrame(rows, columns=_HW_COLS)


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.plans.stock_next4 import _bars_rn

    bars = _bars_rn(spark, sf_dir).select(
        "series_key", "date", "rn", F.col("close").cast("decimal(18,6)").alias("c_d")
    )
    folded = bars.groupBy("series_key").applyInPandas(
        _hw_fold,
        "series_key string, date timestamp, lvl_d decimal(18,6),"
        " tr_d decimal(18,6), seas_d decimal(18,6), fit_d decimal(18,6)",
    )
    return folded.select(
        "series_key",
        "date",
        F.col("lvl_d").cast("double").alias("level"),
        F.col("tr_d").cast("double").alias("trend"),
        F.col("seas_d").cast("double").alias("seasonal"),
        F.col("fit_d").cast("double").alias("fitted"),
    )


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.plans.stock_next4 import _bars_rn

    bars = _bars_rn(spark, sf_dir).select(
        "series_key",
        "rn",
        F.col("close").alias("x"),
        F.col("volume").alias("y"),
    )
    # pairs via operators/pairs.series_pairs: exact C(n,2) at graded
    # sizes (what the oracle replays), deterministic sampled subset
    # past EXACT_MAX rows — the r10 verdict's quadratic-pair scale
    # fix. τ_b is computed from the PAIR SET itself (tied-pair counts
    # instead of the global Σt(t−1)/2 — identical integers on the
    # exact path, and the consistent sample estimator on the long
    # one).
    pairs = series_pairs(bars, ["x", "y"], purpose="kendall_pairs")
    sgn = (
        "CASE WHEN b_x > a_x THEN 1 WHEN b_x < a_x THEN -1 ELSE 0 END"
        " * CASE WHEN b_y > a_y THEN 1 WHEN b_y < a_y THEN -1 ELSE 0 END"
    )
    cd = pairs.groupBy("series_key").agg(
        F.sum(F.expr(f"CAST({sgn} = 1 AS BIGINT)")).alias("concordant"),
        F.sum(F.expr(f"CAST({sgn} = -1 AS BIGINT)")).alias("discordant"),
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.expr("CAST(a_x = b_x AS BIGINT)")).alias("n1"),
        F.sum(F.expr("CAST(a_y = b_y AS BIGINT)")).alias("n2"),
    )
    n = bars.groupBy("series_key").agg(F.count(F.lit(1)).alias("n_days"))
    g = cd.join(n, "series_key")
    den = (
        "CAST(CAST(n0 - n1 AS DECIMAL(19,0)) * CAST(n0 - n2 AS DECIMAL(19,0))"
        " AS DOUBLE)"
    )
    return g.select(
        "series_key",
        "n_days",
        "concordant",
        "discordant",
        (
            F.round(
                F.expr(
                    f"try_divide(CAST(concordant - discordant AS DOUBLE),"
                    f" nullif(sqrt({den}), 0.0))"
                ),
                6,
            )
            + 0.0
        ).alias("tau_b"),
    )


QUERIES_NEXT = {
    "spearman_corr": q_spearman_corr,
    "holt_winters": q_holt_winters,
    "kendall_tau": q_kendall_tau,
}

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

from stock_data_project_spark.plans.stock_next4 import _SEQ

# level update, inlined twice in the recursive step (no lateral
# aliases inside a recursive CTE) — the holt_forecast recipe
_HW_LVL = (
    "CAST(round(CAST(0.2 AS DECIMAL(2,1)) * (s.c_d - r.sl1) "
    "+ CAST(0.8 AS DECIMAL(2,1)) * (r.lvl + r.tr), 6) AS DECIMAL(18,6))"
)

_HW_SEEDS = ",\n               ".join(
    f"max(CASE WHEN rn = {i} THEN c_d END) AS x{i}" for i in range(1, 8)
)
_HW_E = ", ".join(f"CAST(x{i} - l7 AS DECIMAL(18,6)) AS e{i}" for i in range(1, 8))

ORACLE_NEXT = {
    "holt_winters": f"""
        WITH RECURSIVE {_SEQ}, sd AS (
            SELECT series_key, date, rn, CAST(close AS DECIMAL(18,6)) AS c_d
            FROM seq
        ),
        seeds AS (
            SELECT series_key,
               CAST({exact_avg6_sql(
                   "sum(CASE WHEN rn <= 7 THEN CAST(c_d * 1000000 AS BIGINT) END)",
                   "7")} AS DECIMAL(18,6)) AS l7,
               {_HW_SEEDS}
            FROM sd GROUP BY series_key HAVING count(*) >= 8
        ),
        s7 AS (
            SELECT series_key, l7, {_HW_E} FROM seeds
        ),
        rec(series_key, date, rn, lvl, tr,
            sl1, sl2, sl3, sl4, sl5, sl6, sl7, fit) AS (
            SELECT series_key, CAST(NULL AS TIMESTAMP), 7, l7,
                   CAST(0 AS DECIMAL(18,6)),
                   e1, e2, e3, e4, e5, e6, e7,
                   CAST(NULL AS DECIMAL(18,6))
            FROM s7
            UNION ALL
            SELECT s.series_key, s.date, s.rn,
                   {_HW_LVL},
                   CAST(round(CAST(0.1 AS DECIMAL(2,1))
                              * ({_HW_LVL} - r.lvl)
                              + CAST(0.9 AS DECIMAL(2,1)) * r.tr, 6)
                        AS DECIMAL(18,6)),
                   r.sl2, r.sl3, r.sl4, r.sl5, r.sl6, r.sl7,
                   CAST(round(CAST(0.3 AS DECIMAL(2,1))
                              * (s.c_d - {_HW_LVL})
                              + CAST(0.7 AS DECIMAL(2,1)) * r.sl1, 6)
                        AS DECIMAL(18,6)),
                   CAST(r.lvl + r.tr + r.sl1 AS DECIMAL(18,6))
            FROM rec r JOIN sd s
              ON s.series_key = r.series_key AND s.rn = r.rn + 1
        )
        SELECT series_key, date,
               CAST(lvl AS DOUBLE) AS level,
               CAST(tr AS DOUBLE) AS trend,
               CAST(sl7 AS DOUBLE) AS seasonal,
               CAST(fit AS DOUBLE) AS fitted
        FROM rec WHERE rn >= 8
    """,
    "kendall_tau": f"""
        WITH {_SEQ},
        pairs AS (
            SELECT a.series_key,
                   CASE WHEN b.close > a.close THEN 1
                        WHEN b.close < a.close THEN -1 ELSE 0 END
                 * CASE WHEN b.volume > a.volume THEN 1
                        WHEN b.volume < a.volume THEN -1 ELSE 0 END AS sgn
            FROM seq a JOIN seq b
              ON a.series_key = b.series_key AND a.rn < b.rn
        ),
        cd AS (
            SELECT series_key,
                   CAST(sum(CAST(sgn = 1 AS BIGINT)) AS BIGINT) AS concordant,
                   CAST(sum(CAST(sgn = -1 AS BIGINT)) AS BIGINT) AS discordant
            FROM pairs GROUP BY series_key
        ),
        nn AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_days
            FROM seq GROUP BY series_key
        ),
        tx AS (
            SELECT series_key, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1
            FROM (SELECT series_key, close, CAST(count(*) AS BIGINT) AS t
                  FROM seq GROUP BY series_key, close)
            GROUP BY series_key
        ),
        ty AS (
            SELECT series_key, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
            FROM (SELECT series_key, volume, CAST(count(*) AS BIGINT) AS t
                  FROM seq GROUP BY series_key, volume)
            GROUP BY series_key
        ),
        g AS (
            SELECT series_key, n_days, concordant, discordant, n1, n2,
                   n_days * (n_days - 1) // 2 AS n0
            FROM cd JOIN nn USING (series_key)
                    JOIN tx USING (series_key)
                    JOIN ty USING (series_key)
        )
        SELECT series_key, n_days, concordant, discordant,
               round(CAST(concordant - discordant AS DOUBLE)
                     / nullif(sqrt(CAST(CAST(n0 - n1 AS DECIMAL(19,0))
                                        * CAST(n0 - n2 AS DECIMAL(19,0))
                                        AS DOUBLE)), 0.0),
                     6) + 0.0 AS tau_b
        FROM g
    """,
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
