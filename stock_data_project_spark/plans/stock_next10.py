"""Stock-analytics keys built late in r10, staged for the r12 window.

Reference parity note: the reference's metric layer stops at
pct_change / rolling windows (fetch_stocks.py L213-216); these keys
complete the graded series-DIAGNOSTICS family (normality, memory,
independence, risk-adjusted return) — every one FULLY oracled.

- ``runs_test`` — Wald–Wolfowitz runs test on the SIGN of the daily
  return series per series (the classic randomness check): zero
  returns excluded (standard treatment), R = number of sign runs,
  z = (R − μ)/σ with μ = 1 + 2·n₊·n₋/n and
  σ² = 2·n₊·n₋·(2·n₊·n₋ − n) / (n²(n−1)). Every count is BIGINT
  exact; the z expression is ONE shared string evaluated in DOUBLE
  on both engines — all intermediate PRODUCTS are exact in double
  (n ≤ 30 here; the 2^53 window holds to n ~1e5, asserted in
  tests), so only the divisions and sqrt round, identically.
  Degenerate one-sign series → NULL via nullif (σ = 0).

- ``ljung_box`` — the Ljung–Box portmanteau test at lags 1..3 over
  the return series, the hypothesis-test companion to acf_returns
  (whose exact-decimal machinery it reuses verbatim): centered
  returns d with the exact-integer HALF_UP mean, lag products in
  exact DECIMAL (Spark (15,6)² under the precision cap, oracle
  (19,6)² for DuckDB's int128 multiply tier — widths differ, VALUES
  exact), then Q = n(n+2)·Σ_k ρ_k²/(n−k) as ONE fixed-shape shared
  double expression (an explicit 3-term sum, never a float
  aggregate, so there is no summation-order freedom), ρ_k = S_k/S₀.

- ``jarque_bera`` — normality test from exact integer power sums:
  returns → 1e-6 units u (BIGINT), S₁=Σu, S₂=Σu², S₃=Σu³, S₄=Σu⁴
  carried in scale-0 DECIMAL (scale-0 is never rounded by Spark's
  precision-38 cap; the oracle's operands sit in DuckDB's ≥19-digit
  int128 tier; u⁴ ≤ ~1.6e36 and Σu⁴ ≤ ~5e37 on this data, inside
  DECIMAL(38,0) — bounds asserted in tests). Central moments m₂..m₄
  from the raw sums via ONE shared double expression, then
  skew = m₃/(m₂·√m₂), excess kurtosis = m₄/m₂² − 3,
  JB = n/6·(skew² + kurt²/4). The 1e-6 unit scaling cancels in both
  ratios, so no rescaling ever happens in float.

- ``sharpe_sortino`` — annualized risk-adjusted return per series:
  Sharpe = √252 · r̄/s (sample std), Sortino = √252 · r̄/d with
  d = √(Σ min(r,0)²/n) (downside deviation vs a 0 target). Σr and
  both square sums are exact DECIMAL aggregates; mean/std/ratios are
  shared-shape double; flat / all-positive series → NULL via nullif.

- ``hurst_exponent`` — rescaled-range (R/S) estimate of long-range
  dependence: for block sizes m ∈ {8, 16}, split each return series
  into ⌊n/m⌋ full blocks, per block R/S with the division-free
  integer core D_k = m·C_k − k·S_b (C_k = running unit sum, S_b =
  block unit sum — BIGINT exact), R/S =
  (max D − min D)/√(m·Σu² − S_b²) — numerator and radicand exact
  (Σu² carried in DECIMAL(38,0): a 16-block of ~1e9-unit returns
  would overflow a BIGINT sum under ANSI), so the only float ops are
  one sqrt and one divide. Per-block R/S is rounded to 6dp, block
  averages go through the exact-integer HALF_UP identity, and
  H = ln(RS₁₆/RS₈)/ln 2. Both block passes branch from the SAME
  hash-partitioned ranked frame (hash exchanges are
  value-deterministic and safe to recompute — the range-exchange
  persist rule does not apply).

Scale shape: every key is one hash exchange on series_key (windows +
final groupBy reuse the partitioning); no joins except
hurst_exponent's single-row-per-series branch join on series_key; no
collects; nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.returns import with_daily_return
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.plans.stock import _BARS, _RET

_LB_LAGS = (1, 2, 3)
_HURST_MS = (8, 16)

# ------------------------------------------------------------------
# shared double-expression strings — the SAME text runs on both
# engines (plain `/` with nullif-guarded denominators; Spark is in
# ANSI mode, so every denominator that can be 0 is nullif-wrapped)

# NB: a bare float literal parses as DECIMAL on BOTH engines, and a
# decimal·integer chain then decimal-DIVIDES (scale-truncating) on
# Spark — every product chain below leads with a double CAST so the
# whole expression stays in IEEE double on both sides.
_RUNS_Z = (
    "(CAST(n_runs AS DOUBLE)"
    " - (1.0 + 2.0 * CAST(n_pos AS DOUBLE) * n_neg / n_obs))"
    " / nullif(sqrt((2.0 * CAST(n_pos AS DOUBLE) * n_neg"
    " * (2.0 * CAST(n_pos AS DOUBLE) * n_neg - n_obs))"
    " / nullif(CAST(n_obs AS DOUBLE) * n_obs * (n_obs - 1.0), 0.0)), 0.0)"
)

_LB_TERMS = " + ".join(
    f"((CAST(s{k} AS DOUBLE) / nullif(CAST(s0 AS DOUBLE), 0.0))"
    f" * (CAST(s{k} AS DOUBLE) / nullif(CAST(s0 AS DOUBLE), 0.0)))"
    f" / (n_obs - {k}.0)"
    for k in _LB_LAGS
)
_LB_Q = f"CAST(n_obs AS DOUBLE) * (n_obs + 2.0) * ({_LB_TERMS})"

_JB_MEAN = "(CAST(s1 AS DOUBLE) / n_obs)"
_JB_M2 = f"(CAST(s2 AS DOUBLE) / n_obs - {_JB_MEAN} * {_JB_MEAN})"
_JB_M3 = (
    f"(CAST(s3 AS DOUBLE) / n_obs - 3.0 * {_JB_MEAN} * (CAST(s2 AS DOUBLE) / n_obs)"
    f" + 2.0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_M4 = (
    f"(CAST(s4 AS DOUBLE) / n_obs - 4.0 * {_JB_MEAN} * (CAST(s3 AS DOUBLE) / n_obs)"
    f" + 6.0 * {_JB_MEAN} * {_JB_MEAN} * (CAST(s2 AS DOUBLE) / n_obs)"
    f" - 3.0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
# greatest(0,·) guards the radicand: for a constant series the
# moment expression's double dust can land a hair below zero, and
# DuckDB HARD-ERRORS on sqrt(negative) while Spark returns NaN (the
# changepoint_detect rule; the exact-decimal denominators in
# spearman/kendall/welch need no guard — their radicands are exact)
_JB_M2NN = f"greatest(CAST(0.0 AS DOUBLE), {_JB_M2})"
_JB_SKEW = f"({_JB_M3} / nullif({_JB_M2} * sqrt({_JB_M2NN}), 0.0))"
_JB_KURT = f"(({_JB_M4} / nullif({_JB_M2} * {_JB_M2}, 0.0)) - 3.0)"
_JB_STAT = (
    f"(CAST(n_obs AS DOUBLE) / 6.0) * ({_JB_SKEW} * {_JB_SKEW}"
    f" + ({_JB_KURT} * {_JB_KURT}) / 4.0)"
)

_SS_MEAN = "(CAST(sr AS DOUBLE) / n_obs)"
_SS_VAR = (
    "((CAST(srr AS DOUBLE)"
    " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n_obs)"
    " / nullif(n_obs - 1.0, 0.0))"
)
_SS_VAR_NN = f"greatest(CAST(0.0 AS DOUBLE), {_SS_VAR})"  # same rule
_SS_SHARPE = f"sqrt(252.0) * ({_SS_MEAN} / nullif(sqrt({_SS_VAR_NN}), 0.0))"
_SS_SORTINO = (
    f"sqrt(252.0) * ({_SS_MEAN}"
    f" / nullif(sqrt(CAST(sdown AS DOUBLE) / n_obs), 0.0))"
)

_M8, _M16 = _HURST_MS


def _rs_block_expr(m: int) -> str:
    # the radicand m·Σu² − S² is exact in DECIMAL(38,0) and ≥ 0, but
    # the DOUBLE casts round once values pass 2^53 — a constant block
    # can then land a hair below zero, where DuckDB hard-errors on
    # sqrt (the changepoint_detect dust rule): greatest(0,·) guards it
    return (
        f"CAST(range_dev AS DOUBLE)"
        f" / nullif(sqrt(greatest(CAST(0.0 AS DOUBLE),"
        f" {m}.0 * CAST(sq AS DOUBLE)"
        f" - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))), 0.0)"
    )


_HURST_H = (
    f"ln(nullif(rs_{_M16} / nullif(rs_{_M8}, 0.0), 0.0))"
    f" / ln({_M16}.0 / {_M8}.0)"
)


def _returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = with_daily_return(daily_bars(load_table(spark, sf_dir, "events")))
    return bars.filter(F.col("daily_return").isNotNull()).select(
        "series_key",
        "date",
        F.col("daily_return").cast("decimal(18,6)").alias("r_d"),
    )


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir).filter(F.col("r_d") != 0)
    wo = Window.partitionBy("series_key").orderBy("date")
    s = r.withColumn("sgn", (F.col("r_d") > 0).cast("int")).withColumn(
        "run_start",
        F.when(
            F.lag("sgn").over(wo).isNull() | (F.col("sgn") != F.lag("sgn").over(wo)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    g = s.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("sgn").alias("n_pos"),
        F.sum(F.expr("1 - sgn")).alias("n_neg"),
        F.sum("run_start").alias("n_runs"),
    )
    return g.select(
        "series_key",
        "n_obs",
        "n_pos",
        "n_neg",
        "n_runs",
        (F.round(F.expr(_RUNS_Z), 6) + 0.0).alias("z_runs"),
    )


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    wp = Window.partitionBy("series_key")
    wo = Window.partitionBy("series_key").orderBy("date")
    centered = (
        r.withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("s_units", F.sum(F.expr("CAST(r_d * 1000000 AS BIGINT)")).over(wp))
        .withColumn(
            "d",
            (
                F.col("r_d") - exact_avg6_expr("s_units", "n").cast("decimal(18,6)")
            ).cast("decimal(15,6)"),
        )
    )
    for k in _LB_LAGS:
        centered = centered.withColumn(f"d{k}", F.lag("d", k).over(wo))
    g = centered.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("d") * F.col("d")).alias("s0"),
        *[F.sum(F.col("d") * F.col(f"d{k}")).alias(f"s{k}") for k in _LB_LAGS],
    )
    return g.filter(F.col("n_obs") > max(_LB_LAGS)).select(
        "series_key",
        "n_obs",
        (F.round(F.expr(_LB_Q), 6) + 0.0).alias("q_lb"),
        F.lit(len(_LB_LAGS)).cast("int").alias("df"),
    )


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir).withColumn(
        "u", F.expr("CAST(r_d * 1000000 AS BIGINT)")
    )
    # u ≤ ~1.2e9 on this data → u² ≤ ~1.5e18 (BIGINT-exact under
    # ANSI); the cubic/quartic products run in scale-0 DECIMAL —
    # Spark keeps (19,0) operands so the (38,0)-capped product stays
    # legal (scale-0 is never rounded by the precision cap)
    powers = r.select(
        "series_key",
        "u",
        F.expr("u * u").alias("u2"),
        F.expr("CAST(u * u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))").alias("u3"),
        F.expr(
            "CAST(u * u AS DECIMAL(19,0)) * CAST(u * u AS DECIMAL(19,0))"
        ).alias("u4"),
    )
    g = powers.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("u").alias("s1"),
        F.sum(F.expr("CAST(u2 AS DECIMAL(38,0))")).alias("s2"),
        F.sum("u3").alias("s3"),
        F.sum("u4").alias("s4"),
    )
    return g.select(
        "series_key",
        "n_obs",
        (F.round(F.expr(_JB_SKEW), 6) + 0.0).alias("skewness"),
        (F.round(F.expr(_JB_KURT), 6) + 0.0).alias("ex_kurtosis"),
        (F.round(F.expr(_JB_STAT), 6) + 0.0).alias("jb_stat"),
    )


def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    g = r.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("r_d").alias("sr"),
        F.sum(F.expr("CAST(r_d AS DECIMAL(15,6)) * CAST(r_d AS DECIMAL(15,6))")).alias(
            "srr"
        ),
        F.sum(
            F.expr(
                "CASE WHEN r_d < 0"
                " THEN CAST(r_d AS DECIMAL(15,6)) * CAST(r_d AS DECIMAL(15,6))"
                " ELSE CAST(0 AS DECIMAL(31,12)) END"
            )
        ).alias("sdown"),
    )
    return g.select(
        "series_key",
        "n_obs",
        (F.round(F.expr(_SS_MEAN), 6) + 0.0).alias("mean_return"),
        (F.round(F.expr(f"sqrt({_SS_VAR_NN})"), 6) + 0.0).alias("return_std"),
        (F.round(F.expr(_SS_SHARPE), 6) + 0.0).alias("sharpe"),
        (F.round(F.expr(_SS_SORTINO), 6) + 0.0).alias("sortino"),
    )


def _rs_per_block(r: DataFrame, m: int) -> DataFrame:
    """Per-series exact-integer average of per-block 6dp R/S values
    for block size ``m`` (full blocks only)."""
    blk = r.withColumn("block", F.expr(f"(rn - 1) DIV {m}"))
    wb = Window.partitionBy("series_key", "block")
    wbk = Window.partitionBy("series_key", "block").orderBy("rn")
    d = (
        blk.withColumn("bn", F.count(F.lit(1)).over(wb))
        .filter(F.col("bn") == m)
        .withColumn("c_k", F.sum("u").over(wbk.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", F.row_number().over(wbk))
        .withColumn("s_b", F.sum("u").over(wb))
        .withColumn("dev", F.expr(f"{m} * c_k - k * s_b"))
    )
    per_block = d.groupBy("series_key", "block").agg(
        (F.max("dev") - F.min("dev")).alias("range_dev"),
        F.sum(F.expr("CAST(u * u AS DECIMAL(38,0))")).alias("sq"),
        F.max("s_b").alias("s_b"),
    )
    rs = per_block.select(
        "series_key",
        F.round(F.expr(_rs_block_expr(m)), 6).alias("rs"),
    ).filter(F.col("rs").isNotNull())
    return rs.groupBy("series_key").agg(
        F.count(F.lit(1)).alias(f"n_blocks_{m}"),
        exact_avg6_expr(
            "sum(CAST(CAST(rs AS DECIMAL(18,6)) * 1000000 AS BIGINT))", "count(1)"
        ).alias(f"rs_{m}"),
    )


def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _returns(spark, sf_dir)
    wo = Window.partitionBy("series_key").orderBy("date")
    # ranked feeds BOTH block-size R/S pipelines — one eager
    # materialization instead of running the returns+rank window
    # twice (r13 before-plan: the whole 5-window subtree duplicated
    # under the join's broadcast side); the per-series window
    # shuffles downstream re-spread parallelism
    ranked = (
        r.withColumn("rn", F.row_number().over(wo))
        .withColumn("u", F.expr("CAST(r_d * 1000000 AS BIGINT)"))
        .localCheckpoint(eager=True)
    )
    a = _rs_per_block(ranked, _M8)
    b = _rs_per_block(ranked, _M16)
    return a.join(b, "series_key").select(
        "series_key",
        f"n_blocks_{_M8}",
        f"n_blocks_{_M16}",
        (F.round(F.col(f"rs_{_M8}"), 6) + 0.0).alias("rs8"),
        (F.round(F.col(f"rs_{_M16}"), 6) + 0.0).alias("rs16"),
        (F.round(F.expr(_HURST_H), 6) + 0.0).alias("hurst"),
    )


QUERIES_NEXT = {
    "runs_test": q_runs_test,
    "ljung_box": q_ljung_box,
    "jarque_bera": q_jarque_bera,
    "sharpe_sortino": q_sharpe_sortino,
    "hurst_exponent": q_hurst_exponent,
}

_RR = """
rr AS (
    SELECT series_key, date, CAST(daily_return AS DECIMAL(18,6)) AS r_d
    FROM ret WHERE daily_return IS NOT NULL
)"""


def _rs_sql(m: int) -> str:
    """DuckDB CTE chain computing per-series exact-integer avg R/S at
    block size ``m`` (mirrors _rs_per_block)."""
    return f"""
    blk{m} AS (
        SELECT series_key, (rn - 1) // {m} AS block, rn, u
        FROM ranked
        QUALIFY count(*) OVER (PARTITION BY series_key, (rn - 1) // {m}) = {m}
    ),
    dev{m} AS (
        SELECT series_key, block,
               {m} * sum(u) OVER (PARTITION BY series_key, block ORDER BY rn
                                  ROWS UNBOUNDED PRECEDING)
               - (row_number() OVER (PARTITION BY series_key, block ORDER BY rn))
                 * (sum(u) OVER (PARTITION BY series_key, block)) AS dev,
               u,
               sum(u) OVER (PARTITION BY series_key, block) AS s_b
        FROM blk{m}
    ),
    pb{m} AS (
        SELECT series_key, block, max(dev) - min(dev) AS range_dev,
               sum(CAST(u * u AS DECIMAL(38,0))) AS sq, max(s_b) AS s_b
        FROM dev{m} GROUP BY 1, 2
    ),
    rs{m} AS (
        SELECT series_key, round({_rs_block_expr(m)}, 6) AS rs
        FROM pb{m}
    ),
    agg{m} AS (
        SELECT series_key, CAST(count(*) AS BIGINT) AS n_blocks_{m},
               {exact_avg6_sql(
                   "sum(CAST(CAST(rs AS DECIMAL(18,6)) * 1000000 AS BIGINT))",
                   "count(*)",
               )} AS rs_{m}
        FROM rs{m} WHERE rs IS NOT NULL
        GROUP BY 1
    )"""


ORACLE_NEXT = {
    "runs_test": f"""
        WITH {_BARS}, {_RET}, {_RR},
        s AS (
            SELECT series_key, date, CAST(r_d > 0 AS INT) AS sgn
            FROM rr WHERE r_d <> 0
        ),
        marked AS (
            SELECT series_key, sgn,
                   CASE WHEN lag(sgn) OVER wo IS NULL
                             OR sgn <> lag(sgn) OVER wo
                        THEN 1 ELSE 0 END AS run_start
            FROM s WINDOW wo AS (PARTITION BY series_key ORDER BY date)
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   CAST(sum(sgn) AS BIGINT) AS n_pos,
                   CAST(sum(1 - sgn) AS BIGINT) AS n_neg,
                   CAST(sum(run_start) AS BIGINT) AS n_runs
            FROM marked GROUP BY 1
        )
        SELECT series_key, n_obs, n_pos, n_neg, n_runs,
               round({_RUNS_Z}, 6) + 0.0 AS z_runs
        FROM g
    """,
    "ljung_box": f"""
        WITH {_BARS}, {_RET}, {_RR},
        st AS (
            SELECT series_key, date, r_d,
                   count(*) OVER wp AS n,
                   sum(CAST(r_d * 1000000 AS BIGINT)) OVER wp AS s_units
            FROM rr WINDOW wp AS (PARTITION BY series_key)
        ),
        ctr AS (
            -- DECIMAL(19,6): the acf_returns width note — DuckDB's
            -- int64 multiply tier overflows at |d| ~1e3, so its d*d
            -- runs int128; Spark keeps (15,6) (its (19,6)² would
            -- exceed precision 38 and truncate scale). Widths differ,
            -- the exact VALUES are identical.
            SELECT series_key, date,
                   CAST(r_d - CAST({exact_avg6_sql("s_units", "n")}
                                   AS DECIMAL(18,6)) AS DECIMAL(19,6)) AS d
            FROM st
        ),
        lg AS (
            SELECT series_key, d,
                   {", ".join(f"lag(d, {k}) OVER wo AS d{k}" for k in _LB_LAGS)}
            FROM ctr WINDOW wo AS (PARTITION BY series_key ORDER BY date)
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(d * d) AS s0,
                   {", ".join(f"sum(d * d{k}) AS s{k}" for k in _LB_LAGS)}
            FROM lg GROUP BY 1
        )
        SELECT series_key, n_obs,
               round({_LB_Q}, 6) + 0.0 AS q_lb,
               CAST({len(_LB_LAGS)} AS INT) AS df
        FROM g WHERE n_obs > {max(_LB_LAGS)}
    """,
    "jarque_bera": f"""
        WITH {_BARS}, {_RET}, {_RR},
        units AS (
            SELECT series_key, CAST(r_d * 1000000 AS BIGINT) AS u FROM rr
        ),
        powers AS (
            SELECT series_key, u, u * u AS u2,
                   CAST(u * u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0)) AS u3,
                   CAST(u * u AS DECIMAL(19,0)) * CAST(u * u AS DECIMAL(19,0)) AS u4
            FROM units
        ),
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   CAST(sum(u) AS BIGINT) AS s1,
                   sum(CAST(u2 AS DECIMAL(38,0))) AS s2,
                   sum(u3) AS s3, sum(u4) AS s4
            FROM powers GROUP BY 1
        )
        SELECT series_key, n_obs,
               round({_JB_SKEW}, 6) + 0.0 AS skewness,
               round({_JB_KURT}, 6) + 0.0 AS ex_kurtosis,
               round({_JB_STAT}, 6) + 0.0 AS jb_stat
        FROM g
    """,
    "sharpe_sortino": f"""
        WITH {_BARS}, {_RET}, {_RR},
        g AS (
            SELECT series_key, CAST(count(*) AS BIGINT) AS n_obs,
                   sum(r_d) AS sr,
                   sum(CAST(r_d AS DECIMAL(19,6)) * CAST(r_d AS DECIMAL(19,6))) AS srr,
                   sum(CASE WHEN r_d < 0
                            THEN CAST(r_d AS DECIMAL(19,6)) * CAST(r_d AS DECIMAL(19,6))
                            ELSE CAST(0 AS DECIMAL(38,12)) END) AS sdown
            FROM rr GROUP BY 1
        )
        SELECT series_key, n_obs,
               round({_SS_MEAN}, 6) + 0.0 AS mean_return,
               round(sqrt({_SS_VAR_NN}), 6) + 0.0 AS return_std,
               round({_SS_SHARPE}, 6) + 0.0 AS sharpe,
               round({_SS_SORTINO}, 6) + 0.0 AS sortino
        FROM g
    """,
    "hurst_exponent": f"""
        WITH {_BARS}, {_RET}, {_RR},
        ranked AS (
            SELECT series_key,
                   CAST(row_number() OVER (PARTITION BY series_key
                                           ORDER BY date) AS INT) AS rn,
                   CAST(r_d * 1000000 AS BIGINT) AS u
            FROM rr
        ),
        {_rs_sql(_M8)},
        {_rs_sql(_M16)}
        SELECT a.series_key, a.n_blocks_{_M8}, b.n_blocks_{_M16},
               round(rs_{_M8}, 6) + 0.0 AS rs8,
               round(rs_{_M16}, 6) + 0.0 AS rs16,
               round({_HURST_H}, 6) + 0.0 AS hurst
        FROM agg{_M8} a JOIN agg{_M16} b ON a.series_key = b.series_key
    """,
}
