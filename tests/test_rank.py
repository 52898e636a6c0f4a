"""distributed_ntile == Spark's own ntile on a single-partition
window, for sizes that exercise both bucket-size classes, plus a
plan assertion that the distributed version never funnels the data
through one partition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_project_spark.operators.rank import (
    distributed_ntile,
    range_partition_count,
)


def _table(spark, n):
    # pseudo-random but deterministic values, with planted ties
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("v"),
    )


@pytest.mark.parametrize("n,k", [(7, 10), (10, 10), (25, 10), (1000, 10), (1001, 7)])
def test_distributed_ntile_matches_window_ntile(spark, n, k):
    df = _table(spark, n)
    order = [F.desc("v"), F.asc("k")]
    got = {
        r["k"]: r["b"]
        for r in distributed_ntile(df, k, order, out_col="b").collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["k"]: r["b"]
        for r in df.select("k", F.ntile(k).over(w).alias("b")).collect()
    }
    assert got == want


def test_distributed_ntile_no_single_partition_window_on_data(spark):
    """The data path must never funnel through a partitionless global
    window. The ranged frame is materialized through a range exchange
    inside the operator (an eager localCheckpoint, so the returned
    plan starts at Scan ExistingRDD); what remains observable — and
    what the scale guarantee needs — is (a) no Window without the
    per-partition _pid spec and (b) the partition-count policy, which
    must GROW with rows past the core count instead of pinning at a
    deployment constant (r13: the fixed defaultParallelism count
    range-shuffled 10k customers 32 ways — 2724 tasks for one
    rfm_segmentation run — and would under-split a 100 TB column)."""
    df = _table(spark, 10_000)
    plan = (
        distributed_ntile(df, 10, [F.desc("v"), F.asc("k")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark's global-window shape would show a sort over SinglePartition
    # feeding a Window with no partition spec; ours partitions by _pid
    assert "Window" not in plan or "_pid" in plan
    # the checkpointed ranged frame is the data source of the rank path
    assert "ExistingRDD" in plan


def test_range_partition_count_policy():
    # tiny inputs take ONE partition (no 32-way shuffle of 10k rows)
    assert range_partition_count(10_000, 32) == 1
    # mid-size climbs toward core width at ~64k rows/partition
    assert range_partition_count(1_000_000, 32) == 16
    assert range_partition_count(64_000_000, 32) == 32
    # ...and GROWS past the core count with the data (2M rows/part)
    assert range_partition_count(1_000_000_000, 32) == 500
    assert range_partition_count(0, 32) == 1


def test_distributed_ntile_correct_with_pruned_payload_columns(spark):
    """THE r3 regression: an input carrying columns the counts branch
    doesn't need breaks ReuseExchange (column pruning makes the two
    range-exchange subtrees canonically different), so each branch
    sampled its own boundaries — 377/15000 rows mis-bucketed at
    sf0.1. The unconditional persist pins one materialization; with
    a payload column present, values must still match window ntile
    exactly."""
    df = _table(spark, 50_000).withColumn("payload", F.md5(F.col("k").cast("string")))
    try:
        order = [F.desc("v"), F.asc("k")]
        res = distributed_ntile(df, 10, order, out_col="b")
        got = {r["k"]: r["b"] for r in res.collect()}
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k", F.ntile(10).over(Window.orderBy(*order)).alias("b")
            ).collect()
        }
        assert got == want
        # and every branch reads the ONE checkpointed materialization
        # (Scan ExistingRDD — the eager localCheckpoint of the ranged
        # frame; r13 swapped the persist for it)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan
    finally:
        spark.catalog.clearCache()


def test_distributed_ntile_correct_with_exchange_reuse_disabled(spark):
    """With spark.sql.exchange.reuse=false the operator must fall
    back to persisting the ranged frame (one materialization feeds
    both branches) instead of silently mis-bucketing ~15% of rows."""
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = _table(spark, 50_000)
        order = [F.desc("v"), F.asc("k")]
        got = {
            r["k"]: r["b"]
            for r in distributed_ntile(df, 10, order, out_col="b").collect()
        }
        w = Window.orderBy(*order)
        want = {
            r["k"]: r["b"]
            for r in df.select("k", F.ntile(10).over(w).alias("b")).collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.exchange.reuse")
        spark.catalog.clearCache()
