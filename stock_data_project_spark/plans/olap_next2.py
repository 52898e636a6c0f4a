"""OLAP keys staged for the r5 driver window.

plans/olap_next.py held the eight TPC-H shapes staged in r3b and is
now LIVE (olap.py imports it since r4), so this second staging module
carries the r5 OLAP additions — same discipline: parity-proven now by
tests/test_olap_next2.py, registered as ``queries()`` keys only when
they can debut inside r5's correctness window.

The three add grouping shapes the inventory lacks:
- ``grouping_sets_sales`` — explicit GROUPING SETS with grouping()
  flags (ROLLUP/CUBE are graded; arbitrary set lists were not);
- ``revenue_share`` — ratio-to-report: each nation's share of its
  region's revenue via a window over the aggregate;
- ``monthly_running_revenue`` — running cumulative over a calendar
  aggregate per segment (the dashboard "revenue to date" curve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table, register_views


def q_grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at three explicit granularities in one pass:
    (nation, year), (nation), and grand total. grouping() flags
    disambiguate NULL-as-rolled-up from a genuinely NULL key (the
    reason GROUPING SETS output is machine-consumable where
    coalesce('ALL') strings are not). One shuffle: Spark expands the
    sets map-side and aggregates once."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               order_year,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(order_year) AS INT) AS g_year,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM (
            SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
                   o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        GROUP BY GROUPING SETS ((n_name, order_year), (n_name), ())
        """
    )


def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's order revenue. The share
    divides ALREADY-ROUNDED 2dp revenues (double summation order
    differs between engines; the rounded aggregate is the stable
    quantity), then rounds once more at 6dp. Dimension chain
    broadcasts onto orders; the window runs over the ~25-row
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    per_nation = (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


def q_monthly_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment monthly revenue + running cumulative. The running
    sum adds the rounded monthly aggregates in calendar order —
    order-deterministic on both engines, so no further masking is
    needed beyond the monthly 2dp round."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            "c_mktsegment", F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return monthly.withColumn("cum_revenue", F.round(F.sum("revenue").over(w), 2))


def q_range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch range join (operators/rangejoin.py): clicks attributed
    to same-user views ≤30 min prior — the batch twin of the graded
    ``stream_interval_join`` (identical semantics, so the same oracle
    shape), executed as a bucketized HASH join + exact refine instead
    of a nested loop: the (user, 30-min-bucket) key shuffles each
    side once, no cartesian anywhere in the plan."""
    from stock_data_project_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("click_ts"),
    )
    return range_join(
        clicks,
        views,
        point_ts="click_ts",
        start_col="win_start",
        end_col="win_end",
        bucket_width_s=1800,
        extra_keys=[("user_id", "view_user")],
    ).select("view_id", "click_id", "user_id", "view_ts", "click_ts")


def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse
    the JSON payload ONCE into a variant, then typed-path extraction
    (``try_variant_get`` — malformed rows degrade to NULL, never an
    ANSI error). vs ``props_extract``'s get_json_object: variant
    parses once per row instead of once per path, and the binary
    encoding is the shredding-ready columnar form — the modern
    semi-structured story at scale."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"), v.isNull().alias("bad"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("bad").cast("bigint")).alias("n_malformed"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-type HLL sketches of the user
    population, re-aggregated to the grand total by sketch UNION —
    no rescan of the fact table. At 100 TB this is THE distinct-count
    pattern: materialize sketches at the finest grain once, answer
    every coarser rollup by merging kilobyte sketches (exact distinct
    cannot re-aggregate: distinct-per-type does not sum to global
    distinct). Rows-only (estimates have no DuckDB twin); accuracy
    (±5%) and union-vs-direct consistency are pinned in
    tests/test_next_staged.py."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy(F.col("event_type").alias("series_key")).agg(
        F.hll_sketch_agg("user_id").alias("_sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    typed = per_type.select(
        "series_key",
        F.lit(False).alias("is_total"),
        F.hll_sketch_estimate("_sk").alias("approx_users"),
        "n_events",
    )
    # the grand-total marker is a dedicated flag, not a sentinel key
    # value — an event_type literally named "ALL" must stay
    # distinguishable from the rollup row
    total = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    ).select(
        F.lit(None).cast("string").alias("series_key"),
        F.lit(True).alias("is_total"),
        "approx_users",
        "n_events",
    )
    return typed.unionByName(total)


QUERIES_NEXT = {
    "grouping_sets_sales": q_grouping_sets_sales,
    "revenue_share": q_revenue_share,
    "monthly_running_revenue": q_monthly_running_revenue,
    "range_join_clicks": q_range_join_clicks,
    "props_variant": q_props_variant,
    "hll_rollup": q_hll_rollup,
}

ORACLE_NEXT = {
    "grouping_sets_sales": """
        SELECT n_name,
               order_year,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(order_year) AS INT) AS g_year,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM (
            SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
                   o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        GROUP BY GROUPING SETS ((n_name, order_year), (n_name), ())
    """,
    "revenue_share": """
        WITH per_nation AS (
            SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        )
        SELECT r_name, n_name, revenue,
               round(revenue / sum(revenue) OVER (PARTITION BY r_name), 6) AS share
        FROM per_nation
    """,
    "monthly_running_revenue": """
        WITH monthly AS (
            SELECT c_mktsegment,
                   date_trunc('month', o_orderdate) AS month,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment, month, revenue, n_orders,
               round(sum(revenue) OVER (PARTITION BY c_mktsegment ORDER BY month
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW), 2) AS cum_revenue
        FROM monthly
    """,
    # epoch_us on both engines (the repo ts-comparison rule); same
    # semantics as the stream_interval_join oracle, view->click
    "range_join_clicks": """
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               c.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND epoch_us(c.ts) >= epoch_us(v.ts)
         AND epoch_us(c.ts) <= epoch_us(v.ts) + 1800 * 1000000
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    # hll_rollup: rows-only (sketch estimates have no DuckDB twin)
    "props_variant": """
        SELECT event_type,
               round(avg(k), 6) AS avg_k,
               CAST(min(k) AS INT) AS min_k,
               CAST(max(k) AS INT) AS max_k,
               CAST(sum(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_malformed,
               count(*) AS n
        FROM (
            -- guard the hard-error paths (r5 ADVICE): DuckDB's
            -- json_extract ERRORs on malformed JSON and a plain CAST
            -- errors on non-integer values, while the Spark side
            -- degrades to NULL via try_parse_json/try_variant_get.
            -- json_valid + try_cast is the oracle's graceful twin —
            -- current testdata has 0 malformed rows, but testdata
            -- regenerates every round and one bad row must not ERR
            -- the key for a whole round.
            SELECT event_type, props,
                   CASE WHEN json_valid(props)
                        THEN try_cast(json_extract_string(props, '$.k')
                                      AS INTEGER)
                   END AS k
            FROM events
        )
        GROUP BY event_type
    """,
}
