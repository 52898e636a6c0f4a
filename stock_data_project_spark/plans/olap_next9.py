"""OLAP keys built in r9, staged for the r11 window — graph + recsys
shapes over the part co-purchase graph (the frequent_pairs edge
construction at min-support 2).

- ``kcore_decomposition`` — bounded-round k-core peel (k=2, R=6
  synchronous rounds): each round drops nodes whose degree in the
  SURVIVING edge set is < k, then edges touching a dropped node.
  The graded observable is the edge set after EXACTLY R rounds —
  deterministic at any scale whether or not the peel has converged —
  and the in-repo tests additionally pin it to a Python fixpoint
  simulation at the test SFs (where R=6 suffices). Integer-only →
  FULLY oracled via R chained CTEs.

  Scale shape: per round one groupBy(node) degree count + two
  left-semi joins, all uniform-key shuffles proportional to |E|;
  edges localCheckpoint per round (the iterative plan-growth rule);
  an early-exit on an unchanged edge COUNT (peeling only shrinks, so
  equal count == identical set) stops the loop at fixpoint without
  breaking parity with the fixed-R oracle — the skipped rounds are
  provable no-ops. The classic O(log n)-round MPC budget, same as
  dedup_clusters.

- ``item_similarity`` — co-purchase item-item Jaccard (the
  collaborative-filtering similarity every recsys batch job
  computes): sim(a,b) = |orders(a) ∩ orders(b)| /
  (|orders(a)| + |orders(b)| − ∩). Support and order-counts are
  exact integers; the ratio goes through the exact-integer HALF_UP
  rounding identity (operators/rounding), so the key is FULLY
  oracled with zero float-tie risk. Apriori-pruned self-join (a
  pair's support ≤ either item's support) bounds the quadratic step
  exactly like frequent_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.ckpt import loop_checkpoint
from stock_data_project_spark.operators.rounding import exact_avg6_expr, exact_avg6_sql

_K = 2
_ROUNDS = 6
_MIN_SUPPORT = 2

# Materialize-vs-recompute for the (order, part) incidence frame
# (r13 verdict item 6, made input-size-driven): the distinct
# incidence feeds 2-3 consumers (frequency agg, semi probe, both
# pair-join sides — and item_similarity's df_ rollup), and column
# pruning defeats ReuseExchange at those consumers, so the
# lineitem scan + distinct re-runs per consumer. Interleaved A/B on
# replicated lineitem (one eager localCheckpoint of op vs recompute):
# 6M rows a wash (11.2/12.1s rec vs 13.4/11.2s mat), 18M rows
# materialize wins ~1.8x (50.4/41.5s rec vs 34.6/20.7s mat) — the
# crossover sits between, so the switch engages at 10M rows (footer
# count, no job). sf0.1 (600k rows) keeps the recompute plan.
INCIDENCE_MATERIALIZE_ROWS = 10_000_000


def _order_part_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) incidence, eagerly
    materialized above INCIDENCE_MATERIALIZE_ROWS (see note)."""
    from stock_data_project_spark.catalog import table_rows

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    if table_rows(sf_dir, "lineitem") >= INCIDENCE_MATERIALIZE_ROWS:
        op = op.localCheckpoint(eager=True)
    return op


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, op: DataFrame | None = None
) -> DataFrame:
    """Distinct undirected part pairs co-occurring in >= _MIN_SUPPORT
    orders (apriori-pruned before the quadratic step)."""
    if op is None:
        op = _order_part_incidence(spark, sf_dir)
    freq = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _MIN_SUPPORT)
        .select("l_partkey")
    )
    opf = op.join(freq, "l_partkey", "left_semi")
    a = opf.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("a"))
    b = opf.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("b"))
    return (
        a.join(b, "_o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
    )


def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy checkpoints throughout: the count() that drives the
    # fixpoint is each round's one action and materializes the blocks
    # — eager would pay a second full job per round for the same data
    edges = loop_checkpoint(
        _copurchase_edges(spark, sf_dir).select("a", "b"), eager=False
    )
    n_edges = edges.count()
    for _ in range(_ROUNDS):
        if n_edges == 0:
            break
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionByName(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _K).select("node")
        edges = loop_checkpoint(
            edges.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b"),
            eager=False,
        )
        n_next = edges.count()
        if n_next == n_edges:
            # peeling only shrinks: equal count == identical set ==
            # fixpoint; remaining rounds are no-ops on both engines
            break
        n_edges = n_next
    return (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


# Broadcast the per-part document-frequency dim only while the part
# dimension is broadcast-sized (~16 bytes/row → ~80 MB at the cap);
# above it the hint must yield to a plain shuffled hash join — the
# same engage-at-scale split as graph.COACTIVITY_CHUNK_THRESHOLD
# (r9 verdict, What's-wrong #2). |df_| ≤ |part|, so the parquet
# count-star on part (metadata-only) is a safe, cheap proxy.
ITEM_DF_BROADCAST_MAX = 5_000_000


def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE incidence frame shared by df_ and the edge construction —
    # above the materialize threshold both read one checkpointed copy
    op = _order_part_incidence(spark, sf_dir)
    df_ = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("df"))
    hint = (
        F.broadcast
        if load_table(spark, sf_dir, "part").count() <= ITEM_DF_BROADCAST_MAX
        else (lambda d: d)
    )
    pairs = _copurchase_edges(spark, sf_dir, op)
    return (
        pairs.join(
            hint(df_.select(F.col("l_partkey").alias("a"), F.col("df").alias("df_a"))),
            "a",
        )
        .join(
            hint(df_.select(F.col("l_partkey").alias("b"), F.col("df").alias("df_b"))),
            "b",
        )
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "support",
            "df_a",
            "df_b",
            exact_avg6_expr(
                "support * 1000000", "df_a + df_b - support"
            ).alias("jaccard"),
        )
    )


QUERIES_NEXT = {
    "kcore_decomposition": q_kcore_decomposition,
    "item_similarity": q_item_similarity,
}

# AS MATERIALIZED: DuckDB inlines plain CTEs per reference, and each
# peel round references its predecessor ~5 times — inlined, e0 would
# be instantiated 5^R times (measured: "Too many open files" from
# thousands of parquet re-opens at R=6). Materialization evaluates
# each round once, like Spark's per-round localCheckpoint.
_EDGES_CTE = f"""op AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ), e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b, count(*) AS support
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING count(*) >= {_MIN_SUPPORT}
        )"""


def _kcore_sql() -> str:
    rounds = []
    for r in range(_ROUNDS):
        rounds.append(
            f"""deg{r} AS MATERIALIZED (
            SELECT node, count(*) AS deg FROM (
                SELECT a AS node FROM e{r}
                UNION ALL SELECT b FROM e{r}
            ) GROUP BY node
        ), e{r + 1} AS MATERIALIZED (
            SELECT a, b FROM e{r}
            WHERE a IN (SELECT node FROM deg{r} WHERE deg >= {_K})
              AND b IN (SELECT node FROM deg{r} WHERE deg >= {_K})
        )"""
        )
    chain = ",\n        ".join(rounds)
    return f"""
        WITH {_EDGES_CTE},
        {chain}
        SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM e{_ROUNDS}
            UNION ALL SELECT b FROM e{_ROUNDS}
        ) GROUP BY node
    """


ORACLE_NEXT = {
    "kcore_decomposition": _kcore_sql(),
    "item_similarity": f"""
        WITH {_EDGES_CTE}, dfreq AS (
            SELECT p, count(*) AS df FROM op GROUP BY p
        )
        SELECT e0.a AS part_a, e0.b AS part_b,
               CAST(support AS BIGINT) AS support,
               CAST(da.df AS BIGINT) AS df_a,
               CAST(db.df AS BIGINT) AS df_b,
               {exact_avg6_sql("support * 1000000", "da.df + db.df - support")}
                   AS jaccard
        FROM e0
        JOIN dfreq da ON da.p = e0.a
        JOIN dfreq db ON db.p = e0.b
    """,
}
