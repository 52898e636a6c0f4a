"""OLAP keys built in r8 for the r9 driver window.

- ``rfm_segmentation`` — recency/frequency/monetary customer scoring:
  three exact ntile(5) scores over the customer-level RFM frame,
  grouped to a segment matrix. Every ntile is the DISTRIBUTED exact
  rank (operators/rank.distributed_ntile — range exchange + offset
  join), never a single-partition window, so the same plan holds on
  a 1.5B-row customer dim. Monetary sums aggregate in DECIMAL(18,6)
  so the segment averages are summation-order-free (the q9 rule).

- ``pareto_revenue`` — revenue concentration per nation: how many of
  the top customers cover 80% of nation revenue. The running share
  is a DECIMAL cumulative sum over a (revenue DESC, custkey) total
  order, and the 80% test is `cum·5 ≥ total·4` — an EXACT decimal
  comparison with zero float risk. The nation total comes from a
  groupBy joined back broadcast (25 rows), never a full-partition
  window frame (frames ending at unboundedFollowing rescan the
  partition per row — CLAUDE.md).

- ``basket_lift`` — brand-level market-basket association rules:
  support / confidence / lift over distinct (order, brand)
  incidences. The brand dim bounds the pair space at 25·24/2, so
  the within-order self-join shuffles once on orderkey (uniform
  key) and the support joins broadcast 25-row sides. Complements
  ``frequent_pairs`` (part-level, apriori-pruned counts only) with
  the rule-quality metrics.

- ``mad_outliers`` — robust anomaly profile per (event_type, week):
  exact median / median-absolute-deviation via the rank-the-middle
  trick (row_number + integer middle positions + avg of ≤2 rows —
  engine quantile interpolation never enters), then |v−med| > 3·MAD
  flags. Group grain (type × week) keeps window partitions bounded;
  the unbounded-group-size plan is the mergeable KLL sketch
  (quantile_rollup) — this key is the exact complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql

# ------------------------------------------------------- rfm_segmentation


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.operators.rank import distributed_ntile

    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2)
            .cast("decimal(18,6)")
            .alias("_monetary_d"),
        )
        .crossJoin(F.broadcast(ref))
        .withColumn("recency_days", F.datediff("_ref", "_last").cast("int"))
        .drop("_ref", "_last")
        # four consumers (three ntile slices + the scored join) — one
        # materialization, not four recomputes of the orders groupBy;
        # eager localCheckpoint over persist so the blocks release
        # with GC (no unpersist bookkeeping) and downstream joins
        # stay AQE-replannable (the knn_graph measurement)
        .localCheckpoint(eager=True)
    )
    # one count over the checkpointed blocks sizes all three range
    # exchanges (each slice has exactly |rfm| rows)
    n_cust = rfm.count()
    # three INDEPENDENT ntiles joined back on custkey — CHAINING the
    # calls wraps each plan around the previous one ~4× per call
    # (the dedup_clusters plan-growth class: 84 range exchanges in
    # the chained physical plan vs ~6 here, measured by
    # tools/plan_audit.py); independent scores also run in parallel

    def score(metric_col, order_cols, out_col):
        return distributed_ntile(
            rfm.select("custkey", metric_col),
            5,
            order_cols,
            out_col=out_col,
            n_rows=n_cust,
        ).select("custkey", out_col)

    r = score("recency_days", [F.asc("recency_days"), F.asc("custkey")], "r_score")
    f_ = score("frequency", [F.desc("frequency"), F.asc("custkey")], "f_score")
    m_ = score("_monetary_d", [F.desc("_monetary_d"), F.asc("custkey")], "m_score")
    scored = rfm.join(r, "custkey").join(f_, "custkey").join(m_, "custkey")
    # avg of a 6dp decimal sum over a count: exact-integer HALF_UP
    # (operators/rounding — the stream_sliding_avg tie class; a
    # power-of-two segment size puts round(sum/n, 6) exactly on the
    # 5e-7 tie where the engines disagree). Bounds: segment revenue
    # ≤ ~2e10 → 2·units ≤ 4e16, well inside BIGINT.
    out = (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_monetary_d").alias("_sum_d"),
        )
        .withColumn("_units", (F.col("_sum_d") * 1000000).cast("long"))
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            exact_avg6_expr("_units", "n_customers").alias("avg_monetary"),
        )
    )
    # every intermediate is a GC-scoped localCheckpoint now — nothing
    # to release, and the ≤125-row rollup needs no materialization
    return out


_RFM_SQL = """
    WITH rfm AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', max(o_orderdate),
                              (SELECT max(o_orderdate) FROM orders)) AS INT)
                   AS recency_days,
               count(*) AS frequency,
               CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,6)) AS monetary_d
        FROM orders GROUP BY 1
    ), scored AS (
        SELECT *,
               CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC)
                    AS INT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey ASC)
                    AS INT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_d DESC, custkey ASC)
                    AS INT) AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           {avg_monetary} AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
""".format(
    avg_monetary=exact_avg6_sql(
        "CAST(sum(monetary_d) * 1000000 AS BIGINT)", "count(*)"
    )
)


# --------------------------------------------------------- pareto_revenue


def q_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    # rev feeds the nation-total rollup AND the ranking window — one
    # eager materialization instead of re-running the orders groupBy +
    # joins per consumer (r13 before-plan: 12 scans, the whole triple
    # duplicated 4×); the window's n_name shuffle re-spreads
    # parallelism right after the checkpoint
    rev = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).cast("decimal(18,6)").alias("rev_d"))
        .join(cust, "custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .localCheckpoint(eager=True)
    )
    tot = rev.groupBy("n_name").agg(F.sum("rev_d").alias("tot_d"))
    w = (
        Window.partitionBy("n_name")
        .orderBy(F.desc("rev_d"), F.asc("custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        rev.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("n_name").orderBy(F.desc("rev_d"), F.asc("custkey")))
            .cast("int"),
        )
        .withColumn("cum_d", F.sum("rev_d").over(w))
        .join(F.broadcast(tot), "n_name")
    )
    return ranked.groupBy("n_name").agg(
        F.max("rn").alias("n_customers"),
        # exact decimal comparison: cum/total >= 0.8  <=>  cum*5 >= total*4
        F.min(F.when(F.col("cum_d") * 5 >= F.col("tot_d") * 4, F.col("rn"))).alias(
            "n_top_customers"
        ),
        F.round(F.max("tot_d").cast("double"), 2).alias("nation_revenue"),
    )


_PARETO_SQL = """
    WITH rev AS (
        SELECT n_name, o.custkey,
               CAST(round(sum(o.rev), 2) AS DECIMAL(18,6)) AS rev_d
        FROM (SELECT o_custkey AS custkey, sum(o_totalprice) AS rev
              FROM orders GROUP BY 1) o
        JOIN customer ON c_custkey = o.custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT n_name, custkey, rev_d,
               CAST(row_number() OVER w AS INT) AS rn,
               sum(rev_d) OVER (PARTITION BY n_name
                                ORDER BY rev_d DESC, custkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_d,
               sum(rev_d) OVER (PARTITION BY n_name) AS tot_d
        FROM rev
        WINDOW w AS (PARTITION BY n_name ORDER BY rev_d DESC, custkey ASC)
    )
    SELECT n_name,
           max(rn) AS n_customers,
           min(CASE WHEN cum_d * 5 >= tot_d * 4 THEN rn END)
               AS n_top_customers,
           round(CAST(max(tot_d) AS DOUBLE), 2) AS nation_revenue
    FROM ranked GROUP BY 1
"""


# ------------------------------------------------------------ basket_lift


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part), "l_partkey")
        .select("l_orderkey", "p_brand")
        .distinct()
        # four consumers (n_orders, supports, both pair sides) — one
        # materialization of the lineitem⋈part distinct; eager
        # localCheckpoint over persist so downstream joins stay
        # AQE-replannable and the blocks release with GC (659 tasks →
        # re-planned/coalesced at sf0.1)
        .localCheckpoint(eager=True)
    )
    n_orders = ob.agg(F.countDistinct("l_orderkey").alias("_n"))
    supp = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("supp"))
    a = ob.select(F.col("l_orderkey").alias("_o"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("_o"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, ["_o"])
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    sa = supp.select(F.col("p_brand").alias("brand_a"), F.col("supp").alias("_sa"))
    sb = supp.select(F.col("p_brand").alias("brand_b"), F.col("supp").alias("_sb"))
    out = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
    )
    # ratios of BIGINT counts rounded via exact-integer HALF_UP
    # (operators/rounding): support/conf denominators can plausibly be
    # powers of two, the round(p/q, 6) engine-tie class. Bounds at
    # graded SFs: lift numerator pc·n ≤ ~2.3e10 → 2·units ≤ 4.5e16
    # inside BIGINT; a 100 TB run would move lift units to
    # DECIMAL(38,0) (support/conf stay BIGINT at any scale since
    # pc ≤ q there).
    res = out.select(
        "brand_a",
        "brand_b",
        "pair_count",
        exact_avg6_expr("pair_count * 1000000", "_n").alias("support"),
        exact_avg6_expr("pair_count * 1000000", "_sa").alias("conf_a_to_b"),
        exact_avg6_expr("pair_count * _n * 1000000", "_sa * _sb").alias("lift"),
    )
    # ob is GC-scoped now; the |brands|²-bounded rollup needs no
    # extra materialization pass
    return res


_BASKET_SQL = """
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ), supp AS (
        SELECT p_brand, count(*) AS supp FROM ob GROUP BY 1
    ), n AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
    ), pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               count(*) AS pair_count
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, pair_count,
           {support} AS support,
           {conf} AS conf_a_to_b,
           {lift} AS lift
    FROM pairs
    JOIN supp sa ON sa.p_brand = brand_a
    JOIN supp sb ON sb.p_brand = brand_b
    CROSS JOIN n
""".format(
    support=exact_avg6_sql("pair_count * 1000000", "n_orders"),
    conf=exact_avg6_sql("pair_count * 1000000", "sa.supp"),
    lift=exact_avg6_sql("pair_count * n_orders * 1000000", "sa.supp * sb.supp"),
)


# ------------------------------------------------------------ mad_outliers


def _exact_median(df: DataFrame, keys: list[str], col: str, tiebreak: str, out: str):
    """Exact per-group median via rank-the-middle: row_number over a
    total order, integer middle positions lo=(n+1) div 2 /
    hi=(n div 2)+1, avg of the ≤2 middle rows (commutative double
    sum — no engine quantile interpolation anywhere)."""
    w = Window.partitionBy(*keys).orderBy(F.asc(col), F.asc(tiebreak))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    cnts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))
    lo = F.expr("(_cnt + 1) div 2")
    hi = F.expr("(_cnt div 2) + 1")
    return (
        ranked.join(cnts, keys)
        .filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy(*keys)
        .agg(F.avg(col).alias(out))
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("week", F.col("ts")).alias("week"),
        "value",
        "event_id",
    )
    keys = ["event_type", "week"]
    med = _exact_median(ev, keys, "value", "event_id", "med")
    # dev feeds the second median's rank+count branches AND the final
    # flag join — without materialization the ev⋈med subtree (itself
    # containing the first median's window) re-ran per consumer: the
    # r13 before-plan scanned events 18×. One eager checkpoint; the
    # downstream key-partitioned windows re-spread parallelism.
    dev = (
        ev.join(med, keys)
        .withColumn("_dev", F.abs(F.col("value") - F.col("med")))
        .localCheckpoint(eager=True)
    )
    mad = _exact_median(dev, keys, "_dev", "event_id", "mad")
    flagged = dev.join(mad, keys)
    # outlier_rate = round(n_outliers/n_rows, 6) via exact-integer
    # HALF_UP (operators/rounding): a power-of-two group size is the
    # engine-tie class. Bounds: n_outliers·1e6 ≤ ~6e11 at sf0.1.
    return (
        flagged.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("_dev") > 3.0 * F.col("mad"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_outliers"),
        )
        .select(
            *keys,
            "n_rows",
            "median_value",
            "mad",
            "n_outliers",
            exact_avg6_expr("n_outliers * 1000000", "n_rows").alias("outlier_rate"),
        )
    )


_MAD_SQL = """
    WITH ev AS (
        SELECT event_type, date_trunc('week', ts) AS week, value, event_id
        FROM events
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, week
                                  ORDER BY value ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY event_type, week) AS cnt
        FROM ev
    ), med AS (
        SELECT event_type, week, avg(value) AS med
        FROM ranked
        WHERE rn = (cnt + 1) // 2 OR rn = (cnt // 2) + 1
        GROUP BY 1, 2
    ), dev AS (
        SELECT ev.event_type, ev.week, ev.value, ev.event_id, med.med,
               abs(ev.value - med.med) AS dv
        FROM ev JOIN med USING (event_type, week)
    ), dranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, week
                                  ORDER BY dv ASC, event_id ASC) AS rn,
               count(*) OVER (PARTITION BY event_type, week) AS cnt
        FROM dev
    ), mad AS (
        SELECT event_type, week, avg(dv) AS mad
        FROM dranked
        WHERE rn = (cnt + 1) // 2 OR rn = (cnt // 2) + 1
        GROUP BY 1, 2
    )
    SELECT event_type, week,
           count(*) AS n_rows,
           round(max(med), 6) AS median_value,
           round(max(mad), 6) AS mad,
           CAST(sum(CASE WHEN dv > 3.0 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           {rate} AS outlier_rate
    FROM dev JOIN mad USING (event_type, week)
    GROUP BY 1, 2
""".format(
    rate=exact_avg6_sql(
        "CAST(sum(CASE WHEN dv > 3.0 * mad.mad THEN 1 ELSE 0 END)"
        " AS BIGINT) * 1000000",
        "count(*)",
    )
)


QUERIES_NEXT = {
    "rfm_segmentation": q_rfm_segmentation,
    "pareto_revenue": q_pareto_revenue,
    "basket_lift": q_basket_lift,
    "mad_outliers": q_mad_outliers,
}

ORACLE_NEXT = {
    "rfm_segmentation": _RFM_SQL,
    "pareto_revenue": _PARETO_SQL,
    "basket_lift": _BASKET_SQL,
    "mad_outliers": _MAD_SQL,
}
