"""OLAP statistical keys built in r10, staged for the r12 window.

``mann_whitney_u`` — the two-sample rank-sum test (Mann–Whitney U /
Wilcoxon) between EVERY pair of customer segments on account balance,
FULLY oracled via exact integer rank arithmetic. The pairwise
subtlety: U for pair (a,b) ranks only a∪b, so the kruskal_wallis
global ranking does not apply per pair. Instead each pair carries its
own per-value cumulative counts:

- per (pair, cents): m_a, m_b occurrence counts (conditional agg over
  a 10-row broadcast pair table), then per-pair windows give
  cum_a/cum_b = rows strictly below. The average-tie rank identity in
  HALF-UNITS: 2·R_a = Σ_v m_a·(2(cum_a+cum_b) + m_a + m_b + 1), all
  BIGINT-exact; 2·U_a = 2·R_a − n_a(n_a+1).
- tie correction Σ(t³−t) with t = m_a+m_b per value — exact integers
  (DECIMAL(12,0) products so DuckDB's int64 tier can't overflow).
- only the final z enters DOUBLE, with the SAME expression shape both
  engines: z = ((2U − n_a·n_b)/2) / sqrt(n_a·n_b/12 · ((n+1) −
  ΣT/(n(n−1)))), rounded + sign-normalized (a difference through
  zero). u_stat itself is the exact half-integer 2U/2.
- degenerate pairs (all values tied → σ = 0) yield NULL via nullif.

Scale shape: one hash agg over customer to the distinct
(seg, cents) table, a 10-row broadcast join (inequality ⇒ the
metadata-sized BNL class, whitelisted), one window per pair
partition over the values table (bounded by 10 × distinct cents),
then a 10-row aggregate. The corpus-sized work is exactly one scan.

``event_transition_matrix`` — the first-order Markov transition
matrix over per-user event streams: counts and row-normalized
probabilities for every (prev_type → next_type) step. Ordering is
(ts, event_id) so same-ts rows (possible in other datasets; absent
here, asserted in tests) break ties deterministically on both
engines. Probabilities go through the exact-integer HALF_UP average
(operators/rounding), never a double division that could land on the
5e-7 rounding tie. One window over (user_id) + one hash agg — both
reuse the same exchange; scale-safe (state is one lag row).

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
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql

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


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("cents"),
    )
    segs = cust.select("seg").distinct()
    pairs = (
        segs.select(F.col("seg").alias("seg_a"))
        .join(
            F.broadcast(segs.select(F.col("seg").alias("seg_b"))),
            F.col("seg_a") < F.col("seg_b"),
        )
    )
    sc = cust.groupBy("seg", "cents").agg(F.count(F.lit(1)).alias("m"))
    pv = (
        sc.join(
            F.broadcast(pairs),
            (F.col("seg") == F.col("seg_a")) | (F.col("seg") == F.col("seg_b")),
        )
        .groupBy("seg_a", "seg_b", "cents")
        .agg(
            F.sum(F.when(F.col("seg") == F.col("seg_a"), F.col("m")).otherwise(0)).alias("ma"),
            F.sum(F.when(F.col("seg") == F.col("seg_b"), F.col("m")).otherwise(0)).alias("mb"),
        )
    )
    wv = (
        Window.partitionBy("seg_a", "seg_b")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pvc = pv.withColumn(
        "cuma", F.coalesce(F.sum("ma").over(wv), F.lit(0))
    ).withColumn("cumb", F.coalesce(F.sum("mb").over(wv), F.lit(0)))
    g = pvc.groupBy("seg_a", "seg_b").agg(
        F.sum("ma").alias("n_a"),
        F.sum("mb").alias("n_b"),
        F.sum(
            F.col("ma")
            * (2 * (F.col("cuma") + F.col("cumb")) + F.col("ma") + F.col("mb") + 1)
        ).alias("r2a"),
        F.sum(
            F.expr(
                "CAST(ma + mb AS DECIMAL(12,0)) * CAST(ma + mb AS DECIMAL(12,0))"
                " * CAST(ma + mb AS DECIMAL(12,0)) - CAST(ma + mb AS DECIMAL(12,0))"
            )
        ).alias("tie_sum"),
    )
    u2 = "r2a - n_a * (n_a + 1)"
    # greatest(0,·): at full tie degeneracy the (n+1) − tie/(n(n−1))
    # factor is analytically 0 but its double dust can be negative,
    # and DuckDB hard-errors on sqrt(negative) (the changepoint dust
    # rule) — the guard collapses the case to NULL via the nullif
    sigma = (
        "sqrt(greatest(CAST(0.0 AS DOUBLE),"
        " CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
        " * (CAST(n_a + n_b + 1 AS DOUBLE)"
        " - CAST(tie_sum AS DOUBLE)"
        " / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))))"
    )
    return g.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        F.expr(f"CAST({u2} AS DOUBLE) / 2.0").alias("u_stat"),
        (
            F.round(
                F.expr(
                    f"try_divide(CAST({u2} - n_a * n_b AS DOUBLE) / 2.0,"
                    f" nullif({sigma}, 0.0))"
                ),
                6,
            )
            + 0.0
        ).alias("z_stat"),
    )


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    cnt = tr.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wtot = Window.partitionBy("prev_type")
    return (
        cnt.withColumn("n_from", F.sum("n_trans").over(wtot))
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            "n_from",
            exact_avg6_expr("n_trans * 1000000", "n_from").alias("p_trans"),
        )
    )


QUERIES_NEXT = {
    "welch_ttest": q_welch_ttest,
    "kruskal_wallis": q_kruskal_wallis,
    "mann_whitney_u": q_mann_whitney_u,
    "event_transition_matrix": q_event_transition_matrix,
}

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


ORACLE_NEXT["mann_whitney_u"] = """
    WITH cs AS (
        SELECT c_mktsegment AS seg,
               CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer
    ),
    sc AS (
        SELECT seg, cents, CAST(count(*) AS BIGINT) AS m
        FROM cs GROUP BY seg, cents
    ),
    pr AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b
        FROM (SELECT DISTINCT seg FROM cs) a
        JOIN (SELECT DISTINCT seg FROM cs) b ON a.seg < b.seg
    ),
    pv AS (
        SELECT seg_a, seg_b, cents,
               CAST(sum(CASE WHEN seg = seg_a THEN m ELSE 0 END) AS BIGINT) AS ma,
               CAST(sum(CASE WHEN seg = seg_b THEN m ELSE 0 END) AS BIGINT) AS mb
        FROM sc JOIN pr ON seg = seg_a OR seg = seg_b
        GROUP BY seg_a, seg_b, cents
    ),
    pc AS (
        SELECT seg_a, seg_b, ma, mb,
               CAST(coalesce(sum(ma) OVER wv, 0) AS BIGINT) AS cuma,
               CAST(coalesce(sum(mb) OVER wv, 0) AS BIGINT) AS cumb
        FROM pv
        WINDOW wv AS (PARTITION BY seg_a, seg_b ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
        SELECT seg_a, seg_b,
               CAST(sum(ma) AS BIGINT) AS n_a,
               CAST(sum(mb) AS BIGINT) AS n_b,
               CAST(sum(ma * (2 * (cuma + cumb) + ma + mb + 1)) AS BIGINT) AS r2a,
               sum(CAST(ma + mb AS DECIMAL(12,0)) * CAST(ma + mb AS DECIMAL(12,0))
                   * CAST(ma + mb AS DECIMAL(12,0)) - CAST(ma + mb AS DECIMAL(12,0)))
                   AS tie_sum
        FROM pc GROUP BY seg_a, seg_b
    )
    SELECT seg_a, seg_b, n_a, n_b,
           CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_stat,
           round(
               (CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / 2.0)
               / nullif(sqrt(greatest(CAST(0.0 AS DOUBLE),
                   CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                   * (CAST(n_a + n_b + 1 AS DOUBLE)
                      - CAST(tie_sum AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE)
                         * CAST(n_a + n_b - 1 AS DOUBLE))))), 0.0),
               6) + 0.0 AS z_stat
    FROM g
"""

ORACLE_NEXT["event_transition_matrix"] = f"""
    WITH tr AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events
    ),
    cnt AS (
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
        FROM tr WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    tot AS (
        SELECT prev_type, next_type, n_trans,
               CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from
        FROM cnt
    )
    SELECT prev_type, next_type, n_trans, n_from,
           {exact_avg6_sql("n_trans * 1000000", "n_from")} AS p_trans
    FROM tot
"""

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
