"""OLAP keys built in r8, staged for the r9 driver window.

- ``skew_salted_revenue`` — the r7 verdict's composition ask: the
  skew REPORT drives the MITIGATION. The probe side's per-key fanout
  profile (skew_report's TakeOrderedAndProject shape) picks the
  top-K hottest join keys; hot rows go through
  operators/skew.salted_join (build rows for those keys replicated
  salt ways, probe rows scattered), cold rows take the plain join;
  the union aggregates to revenue per (segment, priority). The
  oracle is the PLAIN join — salting and the hot/cold split must be
  invisible in the result, which is exactly the property a driver
  row should pin. At 100 TB the report is one map-side-combined
  groupBy + a K-row driver collect (metadata-sized decision), and
  each hot key's shuffle spreads over ``salt`` tasks instead of one
  straggler.

- ``order_gap_stats`` — per-customer reorder cadence: days between
  consecutive orders (lag over (custkey, orderdate, orderkey) — the
  uniform-key window, millions of partitions, never few), rolled up
  per market segment with exact avg/median/max. Median is
  percentile-interpolated identically on both engines; floats
  rounded 6dp per the parity rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_HOT_K = 12
_SALT = 8


def q_skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    # the report: top-K heaviest probe keys (fanout desc, key asc —
    # a total order, so the decision is deterministic), collected to
    # the driver as the K-row mitigation list
    hot = (
        orders.groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("fanout"))
        .orderBy(F.desc("fanout"), F.asc("custkey"))
        .limit(_HOT_K)
    )
    hot_keys = [r["custkey"] for r in hot.collect()]
    is_hot = F.col("custkey").isin(hot_keys)
    j_hot = salted_join(
        orders.filter(is_hot),
        cust.filter(is_hot),
        "custkey",
        salt=_SALT,
    )
    j_cold = orders.filter(~is_hot).join(cust, "custkey")
    cols = ["c_mktsegment", "o_orderpriority", "o_totalprice"]
    return (
        j_hot.select(*cols)
        .unionByName(j_cold.select(*cols))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return (
        gaps.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap"),
            F.round(F.percentile(F.col("gap_days").cast("double"), F.lit(0.5)), 6).alias(
                "median_gap"
            ),
            F.max("gap_days").alias("max_gap"),
        )
    )


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + new users + cumulative distinct reach —
    the growth-analytics triple. Exact running distinct WITHOUT
    re-scanning history: each user's FIRST-seen day (one uniform
    groupBy) turns the cumulative distinct count into a running sum
    of per-day first-seen counts — the incremental formulation that
    holds at 100 TB (the naive per-day COUNT(DISTINCT) over an
    expanding window rescans the fact). The running-sum window runs
    over the post-agg ~calendar-sized table (metadata-sized single
    partition, like histogram_quantiles' estimator tail)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    day = F.date_trunc("day", F.col("ts")).alias("day")
    active = (
        ev.select(day, "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    new_users = (
        ev.groupBy("user_id")
        .agg(F.min(F.date_trunc("day", F.col("ts"))).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new_users, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cum_users", F.sum("new_users").over(w))
    )


QUERIES_NEXT = {
    "skew_salted_revenue": q_skew_salted_revenue,
    "order_gap_stats": q_order_gap_stats,
    "cumulative_distinct_users": q_cumulative_distinct_users,
}

ORACLE_NEXT = {
    # the PLAIN join: the report-driven hot/cold split + salting must
    # be result-invariant
    "skew_salted_revenue": """
        SELECT c.c_mktsegment, o.o_orderpriority,
               round(sum(o.o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    """,
    "cumulative_distinct_users": """
        WITH active AS (
            SELECT date_trunc('day', ts) AS day,
                   count(DISTINCT user_id) AS active_users
            FROM events WHERE user_id IS NOT NULL
            GROUP BY 1
        ),
        firsts AS (
            SELECT user_id, min(date_trunc('day', ts)) AS day
            FROM events WHERE user_id IS NOT NULL
            GROUP BY 1
        ),
        news AS (
            SELECT day, count(*) AS new_users FROM firsts GROUP BY 1
        )
        SELECT a.day, a.active_users,
               coalesce(n.new_users, 0) AS new_users,
               CAST(sum(coalesce(n.new_users, 0)) OVER (
                   ORDER BY a.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM active a LEFT JOIN news n USING (day)
    """,
    "order_gap_stats": """
        WITH gaps AS (
            SELECT o_custkey,
                   date_diff('day',
                             lag(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey),
                             o_orderdate) AS gap_days
            FROM orders
        )
        SELECT c.c_mktsegment,
               count(*) AS n_gaps,
               round(avg(gap_days), 6) AS avg_gap,
               round(quantile_cont(CAST(gap_days AS DOUBLE), 0.5), 6)
                   AS median_gap,
               CAST(max(gap_days) AS INT) AS max_gap
        FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
        WHERE gap_days IS NOT NULL
        GROUP BY 1
    """,
}
