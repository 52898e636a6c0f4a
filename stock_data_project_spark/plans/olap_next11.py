"""OLAP statistical keys built in r10, staged for the r12 window.

``kruskal_wallis`` — the k-group rank test (rank ANOVA) across ALL
customer segments on account balance, FULLY oracled via exact
integer rank arithmetic:

- ranks with average ties carried in HALF-UNITS: for a distinct
  cents value with t occurrences after cum_before smaller rows,
  2·avg_rank = 2·cum_before + t + 1 — an exact BIGINT. Per-group
  rank sums R2_i = Σ m·r2 stay integral; the tie correction
  Σ(t³−t) likewise.
- the ranking window runs over the DISTINCT-CENTS table (domain-
  bounded, the ks_statistic precedent), never over the raw rows; the
  raw table only feeds two hash aggregations and one equi-join.
- the only non-integral reduction, S = Σ R2_i²/(4·n_i), is a
  5-element DOUBLE sum — made deterministic by accumulating in
  SEGMENT ORDER via a windowed cumulative sum (identical fold order
  on both engines), not a plain aggregate (whose partial order is
  engine-private). H and the tie-corrected H/C then evaluate in
  identically-shaped double arithmetic, rounded + sign-normalized.

``welch_ttest`` — Welch's unequal-variance t-test between every pair
of customer market segments on account balance (the A/B-test
primitive every experimentation pipeline runs), FULLY oracled via the
exact-integer recipe:

- balances are exact cents (BIGINT), so per-segment n, Σx, Σx² are
  exact integers; the variance numerator n·Σx² − (Σx)² is computed in
  scale-0 DECIMAL (widths chosen so BOTH engines stay exact: DuckDB
  needs operand widths summing ≤ 38 — (12,0)·(25,0) and (19,0)² (int128 tier; DuckDB's int64-tier multiply overflows) —
  while Spark's same casts cap at precision 38 with scale 0, which
  never truncates).
- only then does the math enter DOUBLE, with the SAME expression
  shape on both engines: mean = S/n, se² = var_num/(n·n·(n−1))
  (= s²/n without ever forming s² separately), t = (m₁−m₂)/√(se₁²+
  se₂²), Welch–Satterthwaite df = (se₁²+se₂²)²/(se₁⁴/(n₁−1) +
  se₂⁴/(n₂−1)). IEEE doubles make identical expression trees
  bit-equal (sqrt is correctly rounded per IEEE-754 on both), and
  the final round(…, 6) + 0.0 applies the sign-zero rule (t is a
  difference through zero).
- zero-variance degenerate pairs yield NULL via nullif guards.

Scale shape: one groupBy over customer (5-row output), then a
triangular self-join of the 5-row stats table (broadcast; the
ntile_deciles metadata-sized BNL class, whitelisted in
tools/plan_audit.py). The corpus-sized work is exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

# exact-integer per-segment stats, shared shape for both engines:
#   cents    BIGINT        (|acctbal| < 1e10 dollars by width)
#   s        BIGINT        Σcents
#   q        DECIMAL(25,0) Σcents² via (12,0)·(12,0) products
#   var_num  DECIMAL(38,0) n·q − s²  via (12,0)·(25,0) − (19,0)²

_T_STAT_D = (
    "CAST(var_num AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
)


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    stats = (
        cust.select(
            F.col("c_mktsegment").alias("seg"),
            F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("cents"),
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(
                F.expr(
                    "CAST(cents AS DECIMAL(12,0)) * CAST(cents AS DECIMAL(12,0))"
                )
            ).alias("q"),
        )
        .withColumn(
            "var_num",
            F.expr(
                "CAST(n AS DECIMAL(12,0)) * CAST(q AS DECIMAL(25,0))"
                " - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"
            ),
        )
        .withColumn("m", F.expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("se2", F.expr(_T_STAT_D))
        .select("seg", "n", "m", "se2")
    )
    a = stats.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
        F.col("se2").alias("se2_a"),
    )
    b = stats.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
        F.col("se2").alias("se2_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            (
                F.round(
                    F.try_divide(
                        F.col("m_a") - F.col("m_b"),
                        F.nullif(F.sqrt(F.col("se2_a") + F.col("se2_b")), F.lit(0.0)),
                    ),
                    6,
                )
                + 0.0
            ).alias("t_stat"),
            (
                F.round(
                    F.try_divide(
                        (F.col("se2_a") + F.col("se2_b"))
                        * (F.col("se2_a") + F.col("se2_b")),
                        F.nullif(
                            F.col("se2_a") * F.col("se2_a")
                            / F.expr("CAST(n_a - 1 AS DOUBLE)")
                            + F.col("se2_b") * F.col("se2_b")
                            / F.expr("CAST(n_b - 1 AS DOUBLE)"),
                            F.lit(0.0),
                        ),
                    ),
                    6,
                )
                + 0.0
            ).alias("df_welch"),
        )
    )




def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("cents"),
    )
    vc = cust.groupBy("cents").agg(F.count(F.lit(1)).alias("t"))
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    vc2 = vc.withColumn(
        "r2", 2 * F.coalesce(F.sum("t").over(wv), F.lit(0)) + F.col("t") + 1
    )
    sc = cust.groupBy("seg", "cents").agg(F.count(F.lit(1)).alias("m"))
    g = (
        sc.join(vc2, "cents")
        .groupBy("seg")
        .agg(
            F.sum("m").alias("n"),
            F.sum(F.col("m") * F.col("r2")).alias("r2sum"),
        )
        .withColumn(
            "term",
            F.expr(
                "CAST(CAST(r2sum AS DECIMAL(19,0)) * CAST(r2sum AS DECIMAL(19,0))"
                " AS DOUBLE) / (4.0 * CAST(n AS DOUBLE))"
            ),
        )
    )
    wseg = Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("seg").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    last = (
        g.withColumn("s_cum", F.sum("term").over(wseg))
        .withColumn("rn", F.row_number().over(Window.orderBy("seg")))
        .withColumn("k_groups", F.count(F.lit(1)).over(wall))
        .withColumn("n_total", F.sum("n").over(wall))
        .filter(F.col("rn") == F.col("k_groups"))
        .select("k_groups", "n_total", "s_cum")
    )
    ties = vc.agg(
        F.sum(
            F.expr(
                "CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))"
                " * CAST(t AS DECIMAL(12,0)) - CAST(t AS DECIMAL(12,0))"
            )
        ).alias("tie_sum")
    )
    h = (
        "12.0 / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE)) * s_cum"
        " - 3.0 * CAST(n_total + 1 AS DOUBLE)"
    )
    c = (
        "1.0 - CAST(tie_sum AS DOUBLE)"
        " / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)"
        " * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))"
    )
    return last.crossJoin(F.broadcast(ties)).select(
        F.col("k_groups").cast("int").alias("k_groups"),
        "n_total",
        (F.round(F.expr(h), 6) + 0.0).alias("h_stat"),
        (
            F.round(F.expr(f"try_divide({h}, nullif({c}, 0.0))"), 6) + 0.0
        ).alias("h_corrected"),
    )


QUERIES_NEXT = {"welch_ttest": q_welch_ttest, "kruskal_wallis": q_kruskal_wallis}

ORACLE_NEXT = {
    "welch_ttest": f"""
        WITH cs AS (
            SELECT c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
            FROM customer
        ),
        st AS (
            SELECT seg,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(cents) AS s,
                   sum(CAST(cents AS DECIMAL(12,0))
                       * CAST(cents AS DECIMAL(12,0))) AS q
            FROM cs GROUP BY seg
        ),
        ms AS (
            SELECT seg, n,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                   CAST(CAST(n AS DECIMAL(12,0)) * CAST(q AS DECIMAL(25,0))
                        - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))
                        AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n - 1 AS DOUBLE)) AS se2
            FROM st
        )
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               a.n AS n_a, b.n AS n_b,
               round((a.m - b.m)
                     / nullif(sqrt(a.se2 + b.se2), 0), 6) + 0.0 AS t_stat,
               round(((a.se2 + b.se2) * (a.se2 + b.se2))
                     / nullif(a.se2 * a.se2 / CAST(a.n - 1 AS DOUBLE)
                              + b.se2 * b.se2 / CAST(b.n - 1 AS DOUBLE), 0),
                     6) + 0.0 AS df_welch
        FROM ms a JOIN ms b ON a.seg < b.seg
    """,
}


ORACLE_NEXT["kruskal_wallis"] = """
    WITH cs AS (
        SELECT c_mktsegment AS seg,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer
    ),
    vc AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS t
        FROM cs GROUP BY cents
    ),
    vr AS (
        SELECT cents, t,
               2 * coalesce(sum(t) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS r2
        FROM vc
    ),
    sc AS (
        SELECT seg, cents, CAST(count(*) AS BIGINT) AS m
        FROM cs GROUP BY seg, cents
    ),
    g AS (
        SELECT seg, sum(m) AS n, sum(m * r2) AS r2sum
        FROM sc JOIN vr USING (cents)
        GROUP BY seg
    ),
    gt AS (
        SELECT seg, n,
               CAST(CAST(r2sum AS DECIMAL(19,0)) * CAST(r2sum AS DECIMAL(19,0))
                    AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)) AS term
        FROM g
    ),
    lastrow AS (
        SELECT CAST(count(*) OVER () AS INT) AS k_groups,
               CAST(sum(n) OVER () AS BIGINT) AS n_total,
               sum(term) OVER (ORDER BY seg
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cum,
               row_number() OVER (ORDER BY seg) AS rn,
               count(*) OVER () AS kk
        FROM gt
    ),
    ties AS (
        SELECT sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                   * CAST(t AS DECIMAL(12,0)) - CAST(t AS DECIMAL(12,0)))
               AS tie_sum
        FROM vc
    )
    SELECT k_groups, n_total,
           round(12.0 / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
                 * s_cum - 3.0 * CAST(n_total + 1 AS DOUBLE), 6) + 0.0 AS h_stat,
           round((12.0 / (CAST(n_total AS DOUBLE) * CAST(n_total + 1 AS DOUBLE))
                 * s_cum - 3.0 * CAST(n_total + 1 AS DOUBLE))
                 / nullif(1.0 - CAST(tie_sum AS DOUBLE)
                          / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                             * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)),
                          0.0), 6) + 0.0 AS h_corrected
    FROM lastrow, ties
    WHERE rn = kk
"""
