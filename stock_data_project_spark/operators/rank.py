"""Distributed global ranking / ntile without a single-partition
window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the ENTIRE
input through one task — the classic driver-of-one-task killer on a
100 TB fact column. The scale-correct construction is the classic
two-level (tera-sort-style) rank:

1. ``repartitionByRange`` on the sort key — the range exchange
   Spark's own global ``orderBy`` uses, so data is ordered ACROSS
   partitions while each partition sorts locally in parallel;
2. local rank within each range partition from
   ``monotonically_increasing_id()`` over the partition-sorted data:
   the id is documented as (partition_id << 33) | row_position, so
   one projection yields both — NO second full-data exchange (a
   ``Window.partitionBy(spark_partition_id())`` needs a hash
   exchange Catalyst can't elide, measured +25% at 18M rows; a
   ``mapInPandas`` counter pays the Arrow round-trip, +2×);
3. per-partition row counts (one tiny metadata row per partition,
   read from the SAME persisted materialization of the range
   exchange — see the correctness note in ``distributed_ntile``)
   joined triangularly to form exclusive prefix offsets — a
   broadcast join over ~num_partitions rows, never a
   single-partition exchange over data;
4. global rank = partition offset + local rank, and the SQL-standard
   ntile bucket is computed arithmetically from (rank, total).

The per-partition row limit of the id encoding (2^33) bounds
partition size, not table size — pick ``num_partitions`` so no range
partition exceeds ~8.5B rows (any sane layout is orders of magnitude
under). Ranks are deterministic for a total order even though range
boundaries come from sampling: boundary placement moves rows between
partitions but never reorders them.

Exactly matches SQL ``ntile(k) OVER (ORDER BY ...)``: the first
``n % k`` buckets get ``n // k + 1`` rows, the rest ``n // k``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Range-partition sizing (r13, guide §2: derive partitioning from the
# data, never from a constant tuned for one deployment). Below
# _MIN_ROWS_PER_PART extra partitions are pure task/scheduling
# overhead; _MAX_ROWS_PER_PART keeps a partition's narrow (key,
# metric) rows in the 50-100 MB band the shuffle guide targets, so
# the count GROWS past core width with the data instead of pinning at
# defaultParallelism (which under-splits a 100 TB column and
# over-splits a 10k-row one 32 ways — measured 2724 tasks for the
# three ntiles of rfm_segmentation at sf0.1 before this change).
_MIN_ROWS_PER_PART = 65_536
_MAX_ROWS_PER_PART = 2_000_000


def range_partition_count(n_rows: int, parallelism: int) -> int:
    """Data-derived range-partition count: 1 partition while the data
    is small (no task-floor tax), up to ``parallelism`` once rows
    justify ~_MIN_ROWS_PER_PART per task, and GROWING past the core
    count at ceil(n/_MAX_ROWS_PER_PART) so a 100 TB column never pins
    at a deployment constant. ntile output is invariant to this count
    (total order)."""
    return max(
        1,
        min(parallelism, -(-n_rows // _MIN_ROWS_PER_PART)),
        -(-n_rows // _MAX_ROWS_PER_PART),
    )


def distributed_ntile(
    df: DataFrame,
    buckets: int,
    order_cols: list[Column],
    out_col: str = "ntile",
    n_rows: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = SQL ntile(buckets) over a global order,
    computed with two parallel shuffles (range exchange + tiny
    metadata join) instead of one single-partition window.

    ``order_cols`` must define a total order (include a unique
    tie-breaker) so ranks are deterministic regardless of where the
    sampled range boundaries fall — and regardless of the partition
    count, which is derived from the input size (pass ``n_rows`` when
    the caller already knows it to skip the sizing count).

    The ranged frame is localCheckpoint-ed (eager), not persisted:
    blocks release with the frame's GC scope (no unpersist
    bookkeeping, the r12 persist-leak class) and downstream stages
    run over a checkpointed scan AQE can still re-plan (the knn_graph
    persist-vs-checkpoint measurement).
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    if n_rows is None:
        n_rows = df.count()
    n_parts = range_partition_count(n_rows, sc.defaultParallelism)
    # CORRECTNESS depends on the data branch and the counts branch
    # seeing the SAME sampled range boundaries. ReuseExchange is NOT
    # a sufficient guarantee: it dedupes the two range exchanges only
    # when their subtrees canonicalize identically, and column
    # pruning breaks that whenever the input carries columns the
    # counts branch doesn't need (a parquet scan prunes them on one
    # side only → two independently-sampled exchanges → local ranks
    # vs counts disagree → silent mis-bucketing: 377/15000 rows at
    # sf0.1, caught by the r3 full-SF parity sweep; the r2 ADVICE
    # conf-off variant was the same failure at 15%/200k). The eager
    # localCheckpoint pins every branch to ONE materialization
    # regardless of reuse — correctness by construction. It costs one
    # copy of the (already shuffled) data, GC-scoped; at fact-table
    # scale the blocks spill to executor disks, which is the
    # tera-sort intermediate this construction mirrors anyway.
    ranged = df.repartitionByRange(n_parts, *order_cols).localCheckpoint(
        eager=True
    )
    local = (
        ranged.sortWithinPartitions(*order_cols)
        .select("*", F.monotonically_increasing_id().alias("_mid"))
        .select(
            "*",
            F.shiftright(F.col("_mid"), 33).alias("_pid"),
            (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1).alias("_lr"),
        )
    )

    # counts branch hangs off the persisted `ranged` (no sort needed
    # for partition sizes) — deriving counts from the ranked frame
    # was measured 2-3× slower (the sort ran once per plan branch)
    counts = (
        ranged.withColumn("_pid", F.spark_partition_id().cast("long"))
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # exclusive prefix sum via triangular self-join: ~n_parts rows,
    # broadcast both sides — no single-partition exchange anywhere
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    total = counts.agg(F.sum("_cnt").alias("_n"))

    def idiv(a: Column, b: Column) -> Column:
        # integer floor-division; operands here are nonnegative longs
        # well under 2^52, so the double round-trip is exact
        return F.floor(a / b).cast("long")

    r = F.col("_off") + F.col("_lr")  # 1-based global rank
    n = F.col("_n").cast("long")
    k = F.lit(buckets).cast("long")
    q = idiv(n, k)  # small-bucket size
    m = n % k  # number of (q+1)-sized buckets
    big_span = m * (q + F.lit(1))
    bucket = (
        F.when(r <= big_span, idiv(r - F.lit(1), q + F.lit(1)) + F.lit(1))
        # q == 0 implies n < k, every rank sits in the big_span branch;
        # greatest() keeps the unevaluated else-branch ANSI-safe
        .otherwise(m + idiv(r - big_span - F.lit(1), F.greatest(q, F.lit(1))) + F.lit(1))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_pid", "_lr", "_off", "_n", "_mid")
    )
