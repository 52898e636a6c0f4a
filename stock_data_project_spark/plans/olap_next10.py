"""Statistical data-audit keys built in r9, staged for the r11
window — the distribution-level checks a 100 TB data-quality /
drift-monitoring pipeline runs beside the row-level audits
(data_quality_audit, expectation_gate), all engineered to be EXACTLY
oracle-able:

- ``ks_statistic`` — two-sample Kolmogorov-Smirnov distance between
  the BUILDING- and MACHINERY-segment order-value distributions (the
  standard drift test between two cohorts): prices are mapped to
  exact integer cents, and D = max |ECDF_a − ECDF_b| is computed as
  max |ca·m − cb·n| over distinct values IN PURE BIGINT — the KS
  statistic is rational with denominator n·m, so the whole test
  short of the final division is exact integer arithmetic, and the
  division goes through the exact-integer HALF_UP identity. The
  running ECDF window runs over the post-agg distinct-value table
  (domain-bounded, the cumulative_distinct_users class).

- ``gini_coefficient`` — per-segment Gini concentration of customer
  revenue (the inequality twin of pareto_revenue's cumulative-share
  view): G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over rank-ordered exact
  integer cents (ties broken by custkey — pinned ordering). Numerator
  and denominator are exact BIGINTs; the single final division is
  double over identical integers (an arbitrary-integer ratio is not
  the structural power-of-two tie class), rounded 6dp + signed-zero
  guard on both engines.

- ``benford_deviation`` — first-significant-digit distribution of
  order values vs Benford's law (the classic fabricated-data audit):
  first digit extracted via integer→VARCHAR→substr (NO log10 — both
  engines stringify a BIGINT identically, so digit extraction is
  exact even at powers of ten); expected shares log10(1+1/d) PINNED
  as 6dp literals (the retrieval_ndcg trick); observed shares through
  the exact-integer ratio identity.

- ``categorical_association`` — chi-square association audit of the
  documents lang × source contingency table (the categorical-drift
  check): observed counts exact; expected = row·col/N and the cell
  χ² in double over identical exact integers, rounded 6dp. 100 cells
  out of three ~|categories|-key groupBys + broadcast joins.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql

_KS_SEG_A = "BUILDING"
_KS_SEG_B = "MACHINERY"

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


def _seg_cents(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == seg
    )
    return orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
    ).select(F.expr(_CENTS).alias("cents"))


def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _seg_cents(spark, sf_dir, _KS_SEG_A).withColumn("is_a", F.lit(1))
    b = _seg_cents(spark, sf_dir, _KS_SEG_B).withColumn("is_a", F.lit(0))
    # pts (distinct cents values, small) feeds the cumulative window
    # AND supplies both sample sizes: n = Σna and m = Σnb EXACTLY, so
    # the two extra customer scans the separate a.count()/b.count()
    # actions paid (r13 before-plan: 8 scans) collapse into one agg
    # over the checkpointed rollup.
    pts = (
        a.unionByName(b)
        .groupBy("cents")
        .agg(
            F.sum("is_a").alias("na"),
            F.sum(1 - F.col("is_a")).alias("nb"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    sizes = pts.agg(F.sum("na").alias("n"), F.sum("nb").alias("m")).collect()[0]
    n, m = int(sizes["n"] or 0), int(sizes["m"] or 0)
    out = cum.agg(
        F.max(F.abs(F.col("ca") * m - F.col("cb") * n)).alias("d_num")
    )
    return out.select(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(m).cast("bigint").alias("m"),
        F.col("d_num").cast("bigint").alias("d_num"),
        exact_avg6_expr("d_num * 1000000", str(n * m)).alias("ks"),
    )


def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rev = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.expr(_CENTS)).alias("x"))
    )
    wr = Window.partitionBy("c_mktsegment").orderBy("x", "o_custkey")
    ranked = rev.withColumn("i", F.row_number().over(wr).cast("bigint"))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("i") * F.col("x")).alias("a"),
    )
    g = (2 * F.col("a") - (F.col("n") + 1) * F.col("s")) / (
        F.col("n") * F.col("s")
    )
    return agg.select(
        "c_mktsegment",
        "n",
        F.col("s").alias("total_cents"),
        (F.round(g.cast("double"), 6) + 0.0).alias("gini"),
    )


_BENFORD_EXP = {d: round(_math.log10(1 + 1.0 / d), 6) for d in range(1, 10)}


def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(F.expr(_CENTS).cast("string"), 1, 1).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    total = orders.count()
    exp_share = F.element_at(
        F.array(*[F.lit(_BENFORD_EXP[d]) for d in range(1, 10)]), F.col("digit")
    )
    return counts.select(
        "digit",
        "n_obs",
        exact_avg6_expr("n_obs * 1000000", str(total)).alias("obs_share"),
        exp_share.alias("exp_share"),
        (
            F.round(
                F.abs(
                    exact_avg6_expr("n_obs * 1000000", str(total)) - exp_share
                ),
                6,
            )
            + 0.0
        ).alias("abs_dev"),
    )


def q_categorical_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("observed"))
    row_t = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r"))
    col_t = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    n = docs.count()
    e = (F.col("r") * F.col("c")).cast("double") / float(n)
    chi = (F.col("observed") - e) * (F.col("observed") - e) / e
    return (
        obs.join(F.broadcast(row_t), "lang")
        .join(F.broadcast(col_t), "source")
        .select(
            "lang",
            "source",
            "observed",
            F.round(e, 6).alias("expected"),
            (F.round(chi, 6) + 0.0).alias("chi2_cell"),
        )
    )


QUERIES_NEXT = {
    "ks_statistic": q_ks_statistic,
    "gini_coefficient": q_gini_coefficient,
    "benford_deviation": q_benford_deviation,
    "categorical_association": q_categorical_association,
}


def _benford_case(col: str) -> str:
    return (
        "CASE " + col + " "
        + " ".join(f"WHEN {d} THEN {_BENFORD_EXP[d]}" for d in range(1, 10))
        + " END"
    )


ORACLE_NEXT = {
    "ks_statistic": f"""
        WITH a AS (
            SELECT {_CENTS} AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = '{_KS_SEG_A}'
        ), b AS (
            SELECT {_CENTS} AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = '{_KS_SEG_B}'
        ), nm AS (
            SELECT (SELECT count(*) FROM a) AS n, (SELECT count(*) FROM b) AS m
        ), pts AS (
            SELECT cents, sum(is_a) AS na, sum(1 - is_a) AS nb
            FROM (SELECT cents, 1 AS is_a FROM a
                  UNION ALL SELECT cents, 0 FROM b)
            GROUP BY cents
        ), cum AS (
            SELECT sum(na) OVER w AS ca, sum(nb) OVER w AS cb
            FROM pts WINDOW w AS (ORDER BY cents
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)
        ), d AS (
            SELECT max(abs(ca * m - cb * n)) AS d_num FROM cum, nm
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
               CAST(d_num AS BIGINT) AS d_num,
               {exact_avg6_sql("d_num * 1000000", "n * m")} AS ks
        FROM d, nm
    """,
    "gini_coefficient": f"""
        WITH rev AS (
            SELECT c_mktsegment, o_custkey,
                   CAST(sum({_CENTS}) AS BIGINT) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY c_mktsegment ORDER BY x, o_custkey
            ) AS BIGINT) AS i
            FROM rev
        )
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum(x) AS BIGINT) AS total_cents,
               round(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
                     / CAST(count(*) * sum(x) AS DOUBLE), 6) + 0.0 AS gini
        FROM ranked
        GROUP BY c_mktsegment
    """,
    "benford_deviation": f"""
        WITH counts AS (
            SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS INT)
                       AS digit,
                   count(*) AS n_obs
            FROM orders GROUP BY 1
        ), total AS (SELECT count(*) AS t FROM orders)
        SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
               {exact_avg6_sql("n_obs * 1000000", "t")} AS obs_share,
               {_benford_case("digit")} AS exp_share,
               round(abs({exact_avg6_sql("n_obs * 1000000", "t")}
                         - {_benford_case("digit")}), 6) + 0.0 AS abs_dev
        FROM counts, total
    """,
    "categorical_association": """
        WITH obs AS (
            SELECT lang, source, count(*) AS observed
            FROM documents GROUP BY 1, 2
        ), rt AS (SELECT lang, count(*) AS r FROM documents GROUP BY 1),
        ct AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        n AS (SELECT count(*) AS t FROM documents)
        SELECT o.lang, o.source, CAST(o.observed AS BIGINT) AS observed,
               round(CAST(rt.r * ct.c AS DOUBLE) / t, 6) AS expected,
               round((o.observed - CAST(rt.r * ct.c AS DOUBLE) / t)
                     * (o.observed - CAST(rt.r * ct.c AS DOUBLE) / t)
                     / (CAST(rt.r * ct.c AS DOUBLE) / t), 6) + 0.0
                   AS chi2_cell
        FROM obs o JOIN rt ON rt.lang = o.lang
        JOIN ct ON ct.source = o.source CROSS JOIN n
    """,
}
