"""OLAP keys built in r6 for the r7 driver window (registered in
``queries()`` immediately — staging is POSITION in the grade window,
never absence; parity-proven by tests/test_next3_staged.py).

- ``tpch_q18`` — the last uncovered TPC-H shape (large-volume
  customers): big-quantity orders found by ONE lineitem aggregate,
  then joined back — the HAVING subquery becomes a pre-aggregated
  semi-side that is tiny by construction (rare orders), so both
  joins broadcast at any scale.
- ``cohort_ltv`` — cohort revenue analysis: customers bucketed by
  first-order month, revenue tracked by months-since-cohort. Two
  shuffles (first-order agg on custkey, cohort-cell agg on a few
  hundred keys); the custkey join reuses the first agg's
  partitioning.
- ``frequent_pairs`` — market-basket co-occurrence with the apriori
  prune: parts below min-support are dropped BEFORE pairing, so the
  per-order self-join explodes only frequent-item baskets (bounded
  by basket size squared — TPC-H baskets ≤ 13; at 100 TB the prune
  is what keeps the pair space polynomial instead of #parts²).
- ``triangle_count`` — distributed triangle counting over the user
  co-activity graph by DEGREE ORIENTATION (each edge points from its
  (degree, id)-smaller endpoint, every triangle has exactly one
  two-out-degree apex): wedge generation is bounded by the oriented
  out-degree squared — the O(m^1.5) MPC-standard bound — never the
  raw degree squared of hub nodes. Three uniform-key shuffles
  (degree, wedge, close). Fully oracled against DuckDB's canonical
  a<b<c triple join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

_Q18_MIN_QTY = 300
_PAIR_MIN_SUPPORT = 3


def big_quantity_orders(
    li: DataFrame, min_qty: float, round_dp: int | None = None, alias: str = "sum_qty"
) -> DataFrame:
    """The Q18 HAVING core — ONE implementation shared by the
    canonical ``tpch_q18`` (threshold 300) and the earlier
    ``big_orders`` key (plans/olap.py, threshold 250, 2dp-rounded
    quantity), so a quantity-semantics change can never fork the two
    (r6 review finding)."""
    agg = F.sum("l_quantity")
    if round_dp is not None:
        agg = F.round(agg, round_dp)
    return (
        li.groupBy("l_orderkey")
        .agg(agg.alias(alias))
        .filter(F.col(alias) > min_qty)
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 300, with customer identity and order revenue. The
    aggregate core is shared with big_orders (its Q18-shape
    predecessor at threshold 250)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = big_quantity_orders(li, _Q18_MIN_QTY)
    # big is the rare-order set (46 rows at sf0.01, ~0.3% of orders at
    # any SF) — broadcast it so the orders scan never shuffles
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: first-order-month cohorts ×
    months-since-cohort, with active customers, orders, and revenue
    per cell."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    j = orders.join(first, "o_custkey")
    month_offset = (
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
        )
        .cast("int")
        .alias("month_offset")
    )
    return j.groupBy("cohort_month", month_offset).agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts bought together: distinct (order, part) incidence,
    apriori-pruned to frequent parts, self-joined within order to
    canonical pairs (a < b), kept at min support."""
    # shared input-size-driven materialization of the incidence
    # frame (olap_next9._order_part_incidence: recompute at test SF,
    # one eager checkpoint above 10M lineitem rows — measured
    # crossover, see the note there)
    from stock_data_project_spark.plans.olap_next9 import _order_part_incidence

    op = _order_part_incidence(spark, sf_dir)
    # apriori monotonicity: a pair's support <= either part's support,
    # so parts below min support cannot appear in any kept pair —
    # prune them BEFORE the quadratic step
    freq = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _PAIR_MIN_SUPPORT)
        .select("l_partkey")
    )
    opf = op.join(freq, "l_partkey", "left_semi")
    a = opf.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_a")
    )
    b = opf.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, ["_o"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _PAIR_MIN_SUPPORT)
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the user co-activity graph (same consecutive-event
    edge construction as user_influence, canonicalized undirected).
    Output: one row (n_nodes, n_edges, n_triangles)."""
    from stock_data_project_spark.operators.graph import coactivity_seq

    ev = load_table(spark, sf_dir, "events")
    # auto-engages the chunked (keys × days parallel) lag when the
    # biggest event_type stream outgrows one sort task — bit-identical
    # either way (operators/graph.coactivity_seq)
    seq = coactivity_seq(ev)
    e0 = (
        seq.filter(
            F.col("prev_user").isNotNull()
            & (F.col("prev_user") != F.col("user_id"))
        )
        .select(
            F.least("prev_user", "user_id").alias("a"),
            F.greatest("prev_user", "user_id").alias("b"),
        )
        .distinct()
        # reused by degree, orientation, the closing join, and the
        # edge count — persist the (small) edge list once instead of
        # re-running the window+distinct four times
        .persist()
    )
    # deg feeds the two orientation joins AND the node/edge-count agg
    # below; lazy localCheckpoint computes it once (inside the wedge
    # job) and the other consumers re-read the blocks
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # orient each edge from its (deg, id)-smaller endpoint: a total
    # acyclic order, so every triangle has exactly one apex with two
    # out-edges and is counted exactly once
    ed = (
        e0.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # both wedge sides (x, y) scan oriented — lazy checkpoint so the
    # orientation joins run once, not once per self-join side
    oriented = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=False)
    x = oriented.select(F.col("src").alias("_s"), F.col("dst").alias("u"))
    y = oriented.select(F.col("src").alias("_s"), F.col("dst").alias("v"))
    wedges = (
        x.join(y, ["_s"])
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
    )
    # inner join, not semi: e0 is distinct on (a, b), so each wedge
    # closes at most once and the match count IS the triangle count
    try:
        n_tri = wedges.join(e0, ["a", "b"], "inner").count()
        # one agg job over the checkpointed deg replaces the two
        # separate counts: |nodes| = count(deg rows) and, since e0 is
        # distinct on (a, b), sum(deg) counts each edge exactly twice
        # — identical values, one fewer job and no second e0 pass
        nrow = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("CAST(sum(deg) DIV 2 AS BIGINT)").alias("n_edges"),
        ).collect()[0]
        n_nodes, n_edges = nrow["n_nodes"], nrow["n_edges"] or 0
    finally:
        # release even when a count fails mid-way (the r12 verdict's
        # exception-path variant of the persist-leak class)
        e0.unpersist()
    return spark.createDataFrame(
        [(int(n_nodes), int(n_edges), int(n_tri))],
        "n_nodes long, n_edges long, n_triangles long",
    )


QUERIES_NEXT = {
    "tpch_q18": q_tpch_q18,
    "cohort_ltv": q_cohort_ltv,
    "frequent_pairs": q_frequent_pairs,
    "triangle_count": q_triangle_count,
}

ORACLE_NEXT = {
    "tpch_q18": f"""
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > {_Q18_MIN_QTY}
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum_qty AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "cohort_ltv": """
        WITH first AS (
            SELECT o_custkey,
                   date_trunc('month', min(o_orderdate)) AS cohort_month
            FROM orders GROUP BY o_custkey
        )
        SELECT cohort_month,
               CAST(datediff('month', cohort_month,
                             date_trunc('month', o_orderdate)) AS INT)
                   AS month_offset,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN first USING (o_custkey)
        GROUP BY 1, 2
    """,
    "frequent_pairs": f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        freq AS (
            SELECT l_partkey FROM op GROUP BY l_partkey
            HAVING count(*) >= {_PAIR_MIN_SUPPORT}
        ),
        opf AS (
            SELECT l_orderkey, l_partkey FROM op
            WHERE l_partkey IN (SELECT l_partkey FROM freq)
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM opf a
        JOIN opf b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {_PAIR_MIN_SUPPORT}
    """,
    # the canonical a<b<c triple join counts each triangle once —
    # equal to the degree-oriented count by the apex bijection
    "triangle_count": """
        WITH seq AS (
            SELECT user_id,
                   lag(user_id) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS prev_user
            FROM events
        ),
        e0 AS (
            SELECT DISTINCT least(prev_user, user_id) AS a,
                            greatest(prev_user, user_id) AS b
            FROM seq
            WHERE prev_user IS NOT NULL AND prev_user <> user_id
        )
        SELECT (SELECT count(DISTINCT node) FROM (
                    SELECT a AS node FROM e0
                    UNION ALL SELECT b FROM e0)) AS n_nodes,
               (SELECT count(*) FROM e0) AS n_edges,
               (SELECT count(*) FROM e0 e1
                JOIN e0 e2 ON e1.b = e2.a
                JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
}
