"""Batch range join: containment semantics, bucket-width
insensitivity, left-join NULL recovery, NULL bounds, and the
no-cartesian plan guarantee that is the operator's reason to exist."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.operators.rangejoin import range_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(1, 12)),
            (2, _ts(2, 0)),  # exactly on an interval start (inclusive)
            (3, _ts(3, 23, 59)),
            (4, _ts(10)),  # matches nothing
            (5, None),  # NULL ts matches nothing
        ],
        "pid int, t timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts(1), _ts(1, 23, 59)),
            (11, _ts(2), _ts(4)),  # spans 3 days of buckets
            (12, _ts(3), _ts(3, 23, 59)),
            (13, None, _ts(5)),  # NULL bound: explodes to nothing
        ],
        "iid int, s timestamp, e timestamp",
    )
    return points, intervals


EXPECT = {(1, 10), (2, 11), (3, 11), (3, 12)}


def test_inner_containment(spark, sides):
    points, intervals = sides
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "t", "s", "e").collect()
    }
    assert got == EXPECT


@pytest.mark.parametrize("width", [3600, 86400, 7 * 86400])
def test_bucket_width_never_changes_results(spark, sides, width):
    """W is a tuning knob: any width must yield identical pairs."""
    points, intervals = sides
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "t", "s", "e", bucket_width_s=width
        ).collect()
    }
    assert got == EXPECT


def test_left_join_recovers_unmatched(spark, sides):
    points, intervals = sides
    out = range_join(
        points, intervals, "t", "s", "e", how="left", point_id="pid"
    ).collect()
    got = {(r["pid"], r["iid"]) for r in out}
    assert got == EXPECT | {(4, None), (5, None)}
    assert len(out) == len(EXPECT) + 2


def test_left_join_null_safe_without_point_id(spark, sides):
    """Without a unique key the anti join compares every point column
    null-safely — a matched row carrying a NULL column must NOT
    reappear as unmatched."""
    points, intervals = sides
    with_null_col = points.withColumn(
        "payload", F.when(F.col("pid") % 2 == 0, F.col("pid"))
    )
    out = range_join(with_null_col, intervals, "t", "s", "e", how="left").collect()
    got = {(r["pid"], r["iid"]) for r in out}
    assert got == EXPECT | {(4, None), (5, None)}


def test_no_cartesian_in_plan(spark, sides):
    """The whole point: a bucketized HASH join, never
    BroadcastNestedLoop/CartesianProduct (what a naive range
    predicate degrades to)."""
    points, intervals = sides
    plan = (
        range_join(points, intervals, "t", "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_column_collision_raises(spark, sides):
    points, _ = sides
    with pytest.raises(ValueError, match="collision"):
        range_join(points, points, "t", "t", "t")


def test_extra_keys_restrict(spark):
    points = spark.createDataFrame(
        [(1, 7, _ts(1, 12)), (2, 8, _ts(1, 12))], "pid int, u int, t timestamp"
    )
    intervals = spark.createDataFrame(
        [(10, 7, _ts(1), _ts(2))], "iid int, iu int, s timestamp, e timestamp"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "t", "s", "e", extra_keys=[("u", "iu")]
        ).collect()
    }
    assert got == {(1, 10)}


def test_reversed_interval_matches_nothing(spark, sides):
    points, _ = sides
    rev = spark.createDataFrame(
        [(20, _ts(9), _ts(2))], "iid int, s timestamp, e timestamp"
    )
    assert range_join(points, rev, "t", "s", "e").count() == 0


def test_sentinel_interval_trips_guard(spark, sides):
    points, _ = sides
    forever = spark.createDataFrame(
        [(21, _ts(1), dt.datetime(9999, 12, 31))], "iid int, s timestamp, e timestamp"
    )
    # the guard is in-plan (lazy): it fires at execution time
    with pytest.raises(Exception, match="buckets"):
        range_join(points, forever, "t", "s", "e", bucket_width_s=1800).count()
    # wide buckets keep the same interval within bounds and correct
    got = range_join(
        points, forever, "t", "s", "e",
        bucket_width_s=86400 * 365 * 30, max_buckets=300,
    ).collect()
    assert {r["pid"] for r in got} == {1, 2, 3, 4}


def test_reserved_columns_raise(spark, sides):
    points, intervals = sides
    with pytest.raises(ValueError, match="reserved"):
        range_join(points.withColumn("_pb", F.lit(1)), intervals, "t", "s", "e")
