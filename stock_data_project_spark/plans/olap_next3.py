"""OLAP keys built in r5 for the r6 driver window: the warehouse-
maintenance surface a star-schema shop grows after the query layer —
slowly-changing dimensions, interval analytics, and data-quality
gates (Deequ-style audits as first-class queries).

All registered in ``queries()`` immediately (r5 rule: staging is
POSITION in the grade window, never absence); parity-proven by
tests/test_next2_staged.py.

- ``scd2_dim`` — type-2 slowly-changing dimension build: collapse
  each user's consecutive same-tier events into validity intervals
  via gaps-and-islands (lag → change flag → running island id), all
  inside ONE hash partition by user (the two-row_number island idiom
  would force a second (user, tier) exchange). valid_to chains to
  the next version's valid_from; the current version is NULL-open.
- ``scd2_asof`` — the point-in-time join that makes SCD2 useful:
  facts (purchases) joined to the dimension version valid AT their
  timestamp. Because SCD2 intervals are contiguous per key by
  construction, "valid_from <= ts < valid_to" reduces to a backward
  as-of join on valid_from — operators/asof.py, one union+window
  pass, no range explosion, no unboundedFollowing frames.
- ``session_concurrency`` — interval-overlap aggregation: how many
  30-min-gap sessions overlap each hour. The sweep-line global
  running sum would need a single-partition prefix; bucketizing
  instead (each session explodes to its covered hours, count per
  hour) keeps it one uniform-key shuffle — the same
  bucket-decomposition as operators/rangejoin.py, with explode
  factor bounded by session duration.
- ``data_quality_audit`` — column profile of lineitem: per-column
  nulls, exact distincts, min/max (numerics as doubles, timestamps
  as epoch-micros, strings lexicographic). Exact distincts run as
  one column-PRUNED scan each (see the function doc for the
  measured 8× win over the multi-distinct EXPAND); at 100 TB swap
  approx_count_distinct per the approx_stats key.
- ``expectation_gate`` — rule-based constraint check (range rules in
  one conditional-agg scan + a referential anti-join), reporting
  violations per rule: the admission gate of a 100 TB ingest, where
  quarantining runs on the same predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.asof import asof_join

_GAP_S = 1800
_TIER_WIDTH = 50.0


def _scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared implementation: operators/scd2.scd2_build (the same
    runs+merge decomposition the streaming incremental maintainer
    replays — one island implementation, per the repo rule)."""
    from stock_data_project_spark.operators.scd2 import scd2_build

    return scd2_build(load_table(spark, sf_dir, "events"))


def q_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scd2(spark, sf_dir)


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: each purchase fact joined to the tier
    version valid at its timestamp (see module doc for why this is an
    as-of join, not a range join)."""
    # Drop zero-width versions (two same-ts events in different tiers
    # make a version with valid_from == valid_to). They share valid_from
    # with their successor, breaking asof_join's (key, time) uniqueness
    # contract — the carried version would be tie-order-dependent — and
    # the interval semantics (ts < valid_to) can never select them.
    dim = (
        _scd2(spark, sf_dir)
        .filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
        .select("user_id", "valid_from", "tier", "version")
    )
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    joined = asof_join(
        dim,
        facts,
        left_key="user_id",
        right_key="user_id",
        left_time="valid_from",
        right_time="ts",
        value_cols=["tier", "version"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_valid_from").alias("valid_from"),
        "tier",
        "version",
    )


def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions overlapping each hour: sessionize (the graded 30-min
    gap convention), explode each session onto its covered hour
    buckets, count sessions + distinct users per hour."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = F.when(us - F.lag(us).over(w) > _GAP_S * 1_000_000, 1).otherwise(0)
    sess = (
        ev.withColumn("new_session", gap)
        .withColumn(
            "session_seq",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    hour = F.explode(
        F.sequence(
            F.date_trunc("hour", "s_start"),
            F.date_trunc("hour", "s_end"),
            F.expr("interval 1 hour"),
        )
    ).alias("hour_start")
    return (
        sess.select("user_id", hour)
        .groupBy("hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_STR_COLS = ("l_returnflag", "l_linestatus")
_TS_COLS = ("l_shipdate",)


def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row-pass for nulls/min/max/count + one column-PRUNED scan
    per exact distinct, unioned and broadcast back. Measured 8× faster
    (8.3s → 1.0s at sf0.1) than the single agg with six
    count_distincts: multiple distinct aggregates compile to an
    EXPAND that multiplies the full row volume by the distinct count
    through one wide hash aggregate, while a per-column scan reads
    ONE parquet column and partial-aggregates before its shuffle.
    Same trade at 100 TB — distinct columns scan in parallel, each
    column-pruned — though the honest answer at that scale is
    approx_count_distinct (see module doc)."""
    li = load_table(spark, sf_dir, "lineitem")
    all_cols = _NUM_COLS + _STR_COLS + _TS_COLS
    nd = None
    for c in all_cols:
        # NULL excluded to match count(DISTINCT col) semantics — the
        # oracle's and SQL's; a bare groupBy would count the NULL
        # group as a distinct value and diverge the first time a
        # regenerated dataset contains one (r5 review finding)
        d = (
            li.select(c)
            .filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.lit(1))
            .agg(F.count(F.lit(1)).alias(f"{c}__nd"))
        )
        nd = d if nd is None else nd.crossJoin(d)
    aggs, structs = [], []
    for c in all_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nn"))
        if c in _NUM_COLS:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__mn"),
                F.max(c).cast("double").alias(f"{c}__mx"),
            ]
        elif c in _TS_COLS:
            # l_shipdate is TIMESTAMP_NTZ in this testdata generation;
            # NTZ→LTZ cast is the identity under the pinned UTC session
            # zone and unix_micros requires LTZ
            aggs += [
                F.unix_micros(F.min(c).cast("timestamp")).cast("double").alias(
                    f"{c}__mn"
                ),
                F.unix_micros(F.max(c).cast("timestamp")).cast("double").alias(
                    f"{c}__mx"
                ),
            ]
        else:
            aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    wide = li.agg(*aggs).crossJoin(F.broadcast(nd))
    for c in _NUM_COLS + _STR_COLS + _TS_COLS:
        is_str = c in _STR_COLS
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.lit(None).cast("double") if is_str else F.col(f"{c}__mn")).alias(
                    "min_num"
                ),
                (F.lit(None).cast("double") if is_str else F.col(f"{c}__mx")).alias(
                    "max_num"
                ),
                (F.col(f"{c}__mn") if is_str else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (F.col(f"{c}__mx") if is_str else F.lit(None).cast("string")).alias(
                    "max_str"
                ),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def q_expectation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "quantity_in_1_50": ~F.col("l_quantity").between(1, 50)
        | F.col("l_quantity").isNull(),
        "price_positive": (F.col("l_extendedprice") <= 0)
        | F.col("l_extendedprice").isNull(),
        "discount_in_0_1": ~F.col("l_discount").between(0, 1)
        | F.col("l_discount").isNull(),
        "shipdate_not_null": F.col("l_shipdate").isNull(),
    }
    aggs = [
        F.sum(cond.cast("bigint")).alias(name) for name, cond in rules.items()
    ] + [F.count(F.lit(1)).alias("__n")]
    wide = li.agg(*aggs)
    scan_rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).alias("n_violations"),
                        F.col("__n").alias("n_rows"),
                    )
                    for name in rules
                ]
            )
        ).alias("s")
    ).select("s.*")
    orphans = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        # reuse the conditional-agg scan's count — no third lineitem
        # pass just to recount rows (r5 review finding)
        .crossJoin(F.broadcast(wide.select(F.col("__n").alias("n_rows"))))
        .select(
            F.lit("orderkey_in_orders").alias("rule"), "n_violations", "n_rows"
        )
    )
    return scan_rows.unionByName(orphans)


def q_user_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the user co-activity graph: an edge
    joins the users of CONSECUTIVE events in each event_type stream
    (linear in events — never within-group all-pairs), symmetrized so
    every node has out-degree >= 1 (operators/graph.pagerank's
    no-dangling contract), edge weight = co-occurrence count.

    Fully oracled: per-iteration 6dp rounding makes the trajectory
    engine-deterministic, so the DuckDB twin replays all 10 iterations
    with a recurring-aggregate recursive CTE (see operators/graph.py
    for why the Spark loop localCheckpoints each round)."""
    from stock_data_project_spark.operators.graph import coactivity_seq, pagerank

    ev = load_table(spark, sf_dir, "events")
    # auto-engages the chunked (keys × days parallel) lag when the
    # biggest event_type stream outgrows one sort task — bit-identical
    # either way (operators/graph.coactivity_seq)
    seq = coactivity_seq(ev)
    p0 = seq.filter(
        F.col("prev_user").isNotNull() & (F.col("prev_user") != F.col("user_id"))
    ).select(F.col("prev_user").alias("src"), F.col("user_id").alias("dst"))
    edges = (
        p0.unionByName(p0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, damping=0.85, iters=10).select(
        F.col("node").alias("user_id"), "rank"
    )


def q_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff, graded: "yesterday's" daily-bars rollup
    (events with event_id % 50 != 0 — a 2% late-arriving-data
    simulation) diffed against today's full rollup via
    operators/cdc.snapshot_diff. Days that received late events
    surface as updates; days whose every event was late surface as
    inserts; deletes are structurally impossible here (the old event
    set is a subset) and the oracle proves that by construction.
    The oracle compares value columns DIRECTLY (no hash), so a
     2^-64 row-hash collision on the Spark side would fail parity —
    the check doubles as the collision audit."""
    from stock_data_project_spark.operators.cdc import snapshot_diff
    from stock_data_project_spark.operators.series import daily_bars

    ev = load_table(spark, sf_dir, "events")
    old = daily_bars(ev.filter(F.col("event_id") % 50 != 0))
    new = daily_bars(ev)
    return snapshot_diff(old, new, ["series_key", "date"])


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key salting machinery graded on result invariance:
    orders ⋈ customer via operators/skew.salted_join (8-way key
    split — build side replicated, probe side hash-salted), rolled up
    to revenue per (segment, priority). The oracle is the PLAIN join:
    salting must be invisible in the result, which is exactly the
    property worth a driver row (at 100 TB the salt spreads one hot
    customer across 8 tasks instead of one straggler)."""
    from stock_data_project_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    j = salted_join(orders, cust.select("custkey", "c_mktsegment"), "custkey")
    return j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_QR_BINS = 512
_QR_PS = (0.5, 0.9, 0.99)


def histogram_quantiles(binned: DataFrame, stats: DataFrame) -> DataFrame:
    """Shared estimator tail for the histogram-sketch quantile keys
    (batch ``quantile_rollup`` and streaming ``stream_quantile`` run
    the identical arithmetic — one implementation, per the repo
    rule). ``binned``: (series_key, bin, n) sketch rows; ``stats``: a
    1-row (_lo, _hi) domain frame. Everything here touches ≤ a few
    thousand rows."""
    spark = binned.sparkSession
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(_QR_BINS))
    merged = binned.select(
        "series_key", F.lit(False).alias("is_total"), "bin", "n"
    ).unionByName(
        # the rollup: merge per-type sketches by bin — kilobytes, no
        # fact rescan; the total marker is a flag, never a sentinel
        binned.groupBy("bin")
        .agg(F.sum("n").alias("n"))
        .select(
            F.lit(None).cast("string").alias("series_key"),
            F.lit(True).alias("is_total"),
            "bin",
            "n",
        )
    )
    wp = Window.partitionBy("series_key", "is_total")
    cum = merged.withColumn(
        "cum",
        F.sum("n").over(wp.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("total", F.sum("n").over(wp))
    ps = spark.createDataFrame([(float(p),) for p in _QR_PS], "p double")
    # first bin whose cumulative count reaches rank p·total; ≤ 3·types
    # ·512 candidate rows, so the broadcast nested loop is free
    sel = (
        cum.crossJoin(F.broadcast(ps))
        .filter(F.col("cum") >= F.col("p") * F.col("total"))
        .groupBy("series_key", "is_total", "p", "total")
        .agg(F.min_by(F.struct("bin", "n", "cum"), "bin").alias("_s"))
    )
    est = F.col("_lo") + width * (
        F.col("_s.bin")
        + (F.col("p") * F.col("total") - (F.col("_s.cum") - F.col("_s.n")))
        / F.col("_s.n")
    )
    return sel.crossJoin(F.broadcast(stats)).select(
        "series_key",
        "is_total",
        "p",
        F.round(est, 6).alias("approx_value"),
        F.col("total").alias("n_values"),
    )


def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-QUANTILE rollup — the percentile twin of hll_rollup:
    per-type equi-width histogram sketches of ``value``, re-aggregated
    to the grand total by vector-summing bin counts, never rescanning
    the fact table. At 100 TB this is the re-aggregatable-percentile
    pattern: materialize kilobyte histograms at the finest grain once,
    answer every coarser rollup by merging them (exact percentiles
    cannot re-aggregate: a per-type p99 says nothing about the global
    p99). Unlike percentile_approx's opaque internal sketch, the
    histogram estimator is DETERMINISTIC arithmetic — floor-binning,
    cumulative counts, linear interpolation at rank p·n — so this key
    is fully oracled (DuckDB runs the identical estimator), with the
    accuracy-vs-exact bound (≤ one bin width) pinned in
    tests/test_next2_staged.py.

    Plan: one pruned (event_type, value) fact scan partial-aggregated
    map-side to ≤ types × 512 rows; the domain probe (global min/max)
    is a second single-column scan folded in as a broadcast 1-row
    aggregate (the scalar-subquery pattern) — at 100 TB the domain
    comes from table stats instead. Everything after the groupBy
    touches ≤ a few thousand rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    stats = ev.agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(_QR_BINS))
    # degenerate-domain guard (hi == lo → all values equal): 0/0 is
    # NaN and CAST(NaN AS INT) raises under ANSI mode — degrade to a
    # single bin instead, mirrored in the oracle (r6 review finding)
    bin_of = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(
            F.floor((F.col("value") - F.col("_lo")) / width).cast("int"),
            F.lit(_QR_BINS - 1),
        ),
    ).otherwise(F.lit(0))
    binned = (
        ev.crossJoin(F.broadcast(stats))
        .select(F.col("event_type").alias("series_key"), bin_of.alias("bin"))
        .groupBy("series_key", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return histogram_quantiles(binned, stats)


QUERIES_NEXT = {
    "scd2_dim": q_scd2_dim,
    "scd2_asof": q_scd2_asof,
    "session_concurrency": q_session_concurrency,
    "data_quality_audit": q_data_quality_audit,
    "expectation_gate": q_expectation_gate,
    "user_influence": q_user_influence,
    "snapshot_delta": q_snapshot_delta,
    "salted_join_revenue": q_salted_join_revenue,
    "quantile_rollup": q_quantile_rollup,
}

_SCD2_SQL = """
base AS (
    SELECT user_id, ts, event_id,
           CAST(floor(value / 50.0) AS INT) AS tier
    FROM events
),
flagged AS (
    SELECT user_id, ts, event_id, tier,
           CASE WHEN lag(tier) OVER w IS NULL
                     OR tier <> lag(tier) OVER w
                THEN 1 ELSE 0 END AS change
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
    SELECT user_id, ts, tier,
           sum(change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged
),
dim AS (
    SELECT user_id, island, tier,
           min(ts) AS valid_from,
           count(*) AS n_events
    FROM runs GROUP BY 1, 2, 3
),
versions AS (
    SELECT user_id, tier, valid_from,
           lead(valid_from) OVER wv AS valid_to,
           n_events,
           CAST(row_number() OVER wv AS INT) AS version
    FROM dim
    WINDOW wv AS (PARTITION BY user_id ORDER BY valid_from, island)
)"""

ORACLE_NEXT = {
    "scd2_dim": f"""
        WITH {_SCD2_SQL}
        SELECT user_id, tier, valid_from, valid_to, n_events, version
        FROM versions
    """,
    "scd2_asof": f"""
        WITH {_SCD2_SQL}
        SELECT f.event_id, f.user_id, f.ts, f.value,
               v.valid_from, v.tier, v.version
        FROM events f
        JOIN versions v
          ON f.user_id = v.user_id
         AND v.valid_from <= f.ts
         AND (f.ts < v.valid_to OR v.valid_to IS NULL)
        WHERE f.event_type = 'purchase'
    """,
    "session_concurrency": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_GAP_S} * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq,
                   ts
            FROM flagged
        ),
        ivals AS (
            SELECT user_id, session_seq,
                   min(ts) AS s_start, max(ts) AS s_end
            FROM sess GROUP BY 1, 2
        ),
        hours AS (
            SELECT user_id,
                   unnest(generate_series(date_trunc('hour', s_start),
                                          date_trunc('hour', s_end),
                                          INTERVAL 1 HOUR)) AS hour_start
            FROM ivals
        )
        SELECT hour_start,
               count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users
        FROM hours GROUP BY hour_start
    """,
    "data_quality_audit": """
        WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
        SELECT 'l_quantity' AS col_name, n_rows,
               (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS n_null,
               (SELECT count(DISTINCT l_quantity) FROM lineitem) AS n_distinct,
               (SELECT CAST(min(l_quantity) AS DOUBLE) FROM lineitem) AS min_num,
               (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM n
        UNION ALL
        SELECT 'l_extendedprice', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_extendedprice IS NULL),
               (SELECT count(DISTINCT l_extendedprice) FROM lineitem),
               (SELECT CAST(min(l_extendedprice) AS DOUBLE) FROM lineitem),
               (SELECT CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem),
               NULL, NULL
        FROM n
        UNION ALL
        SELECT 'l_discount', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_discount IS NULL),
               (SELECT count(DISTINCT l_discount) FROM lineitem),
               (SELECT CAST(min(l_discount) AS DOUBLE) FROM lineitem),
               (SELECT CAST(max(l_discount) AS DOUBLE) FROM lineitem),
               NULL, NULL
        FROM n
        UNION ALL
        SELECT 'l_returnflag', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL),
               (SELECT count(DISTINCT l_returnflag) FROM lineitem),
               NULL, NULL,
               (SELECT min(l_returnflag) FROM lineitem),
               (SELECT max(l_returnflag) FROM lineitem)
        FROM n
        UNION ALL
        SELECT 'l_linestatus', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_linestatus IS NULL),
               (SELECT count(DISTINCT l_linestatus) FROM lineitem),
               NULL, NULL,
               (SELECT min(l_linestatus) FROM lineitem),
               (SELECT max(l_linestatus) FROM lineitem)
        FROM n
        UNION ALL
        SELECT 'l_shipdate', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL),
               (SELECT count(DISTINCT l_shipdate) FROM lineitem),
               (SELECT CAST(epoch_us(min(l_shipdate)) AS DOUBLE) FROM lineitem),
               (SELECT CAST(epoch_us(max(l_shipdate)) AS DOUBLE) FROM lineitem),
               NULL, NULL
        FROM n
    """,
    "expectation_gate": """
        WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
        SELECT 'quantity_in_1_50' AS rule,
               (SELECT count(*) FROM lineitem
                WHERE NOT (l_quantity BETWEEN 1 AND 50)
                   OR l_quantity IS NULL) AS n_violations,
               n_rows
        FROM n
        UNION ALL
        SELECT 'price_positive',
               (SELECT count(*) FROM lineitem
                WHERE l_extendedprice <= 0 OR l_extendedprice IS NULL),
               n_rows
        FROM n
        UNION ALL
        SELECT 'discount_in_0_1',
               (SELECT count(*) FROM lineitem
                WHERE NOT (l_discount BETWEEN 0 AND 1)
                   OR l_discount IS NULL),
               n_rows
        FROM n
        UNION ALL
        SELECT 'shipdate_not_null',
               (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL),
               n_rows
        FROM n
        UNION ALL
        SELECT 'orderkey_in_orders',
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
               n_rows
        FROM n
    """,
    # (1.0 - 0.85) spelled as the SUBTRACTION on both engines: the
    # IEEE result differs from a 0.15 literal in the last bit, and the
    # per-iteration rounding would amplify that into visible drift
    "user_influence": """
        WITH RECURSIVE seq AS (
            SELECT user_id,
                   lag(user_id) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS prev_user
            FROM events
        ), p0 AS (
            SELECT prev_user AS src, user_id AS dst FROM seq
            WHERE prev_user IS NOT NULL AND prev_user <> user_id
        ), edges AS (
            SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
            FROM (
                SELECT src, dst FROM p0
                UNION ALL
                SELECT dst AS src, src AS dst FROM p0
            ) GROUP BY 1, 2
        ), outw AS (
            SELECT src, sum(w) AS W FROM edges GROUP BY src
        ), nodes AS (
            SELECT DISTINCT src AS node FROM edges
        ), nn AS (
            SELECT count(*) AS n FROM nodes
        ), pr(iter, node, rank) AS (
            SELECT 0, node, round(1.0 / (SELECT n FROM nn), 6) FROM nodes
            UNION ALL
            SELECT pr.iter + 1, e.dst,
                   round((1.0 - 0.85) / (SELECT n FROM nn)
                         + 0.85 * sum(pr.rank * e.w / o.W), 6)
            FROM pr
            JOIN edges e ON pr.node = e.src
            JOIN outw o ON e.src = o.src
            WHERE pr.iter < 10
            GROUP BY pr.iter, e.dst
        )
        SELECT node AS user_id, rank FROM pr WHERE iter = 10
    """,
    # direct column comparison (no hash) — see q_snapshot_delta doc
    "snapshot_delta": """
        WITH 
bars_old AS (
    SELECT event_type AS series_key,
           date_trunc('day', ts) AS date,
           arg_min(value, ts) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close,
           count(*) AS volume,
           round(sum(value), 6) AS turnover
    FROM events WHERE event_id % 50 <> 0
    GROUP BY 1, 2
),
bars_new AS (
    SELECT event_type AS series_key,
           date_trunc('day', ts) AS date,
           arg_min(value, ts) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close,
           count(*) AS volume,
           round(sum(value), 6) AS turnover
    FROM events 
    GROUP BY 1, 2
),
        j AS (
            SELECT coalesce(n.series_key, o.series_key) AS series_key,
                   coalesce(n.date, o.date) AS date,
                   CASE WHEN o.series_key IS NULL THEN 'insert'
                        WHEN n.series_key IS NULL THEN 'delete'
                        WHEN (o.open IS DISTINCT FROM n.open)
                          OR (o.high IS DISTINCT FROM n.high)
                          OR (o.low IS DISTINCT FROM n.low)
                          OR (o.close IS DISTINCT FROM n.close)
                          OR (o.volume IS DISTINCT FROM n.volume)
                          OR (o.turnover IS DISTINCT FROM n.turnover)
                        THEN 'update' END AS change_kind,
                   CASE WHEN n.series_key IS NULL THEN o.open ELSE n.open END AS open,
                   CASE WHEN n.series_key IS NULL THEN o.high ELSE n.high END AS high,
                   CASE WHEN n.series_key IS NULL THEN o.low ELSE n.low END AS low,
                   CASE WHEN n.series_key IS NULL THEN o.close ELSE n.close END AS close,
                   CASE WHEN n.series_key IS NULL THEN o.volume ELSE n.volume END AS volume,
                   CASE WHEN n.series_key IS NULL THEN o.turnover ELSE n.turnover END AS turnover
            FROM bars_old o
            FULL OUTER JOIN bars_new n
              ON o.series_key = n.series_key AND o.date = n.date
        )
        SELECT series_key, date, open, high, low, close, volume,
               turnover, change_kind
        FROM j WHERE change_kind IS NOT NULL
    """,
    # the plain join IS the oracle: salting must not change results
    "salted_join_revenue": """
        SELECT c_mktsegment, o_orderpriority,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """,
    # the IDENTICAL deterministic estimator on both engines: same
    # floor-binning (double arithmetic is bitwise-reproducible), same
    # cumulative ranks, same interpolation — so the approximate
    # quantiles hash-match exactly
    "quantile_rollup": f"""
        WITH stats AS (
            SELECT min(value) AS lo, max(value) AS hi
            FROM events WHERE value IS NOT NULL
        ),
        binned AS (
            SELECT event_type AS series_key,
                   CASE WHEN hi > lo
                        THEN LEAST(CAST(floor((value - lo)
                                   / ((hi - lo) / {_QR_BINS}.0)) AS INT),
                                   {_QR_BINS - 1})
                        ELSE 0 END AS bin,
                   count(*) AS n
            FROM events, stats WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        merged AS (
            SELECT series_key, FALSE AS is_total, bin, n FROM binned
            UNION ALL
            SELECT NULL, TRUE, bin, CAST(sum(n) AS BIGINT)
            FROM binned GROUP BY bin
        ),
        cum AS (
            SELECT series_key, is_total, bin, n,
                   sum(n) OVER (PARTITION BY series_key, is_total
                                ORDER BY bin) AS cum,
                   sum(n) OVER (PARTITION BY series_key, is_total) AS total
            FROM merged
        ),
        sel AS (
            SELECT series_key, is_total, p, total,
                   arg_min(bin, bin) AS bin,
                   arg_min(n, bin) AS n,
                   arg_min(cum, bin) AS cum
            FROM cum,
                 (SELECT unnest([{", ".join(f"CAST({p} AS DOUBLE)" for p in _QR_PS)}])
                         AS p) ps
            WHERE cum >= p * total
            GROUP BY 1, 2, 3, 4
        )
        SELECT series_key, is_total, p,
               round(lo + ((hi - lo) / {_QR_BINS}.0)
                     * (bin + (p * total - (cum - n)) / n), 6) AS approx_value,
               CAST(total AS BIGINT) AS n_values
        FROM sel, stats
    """,
}
