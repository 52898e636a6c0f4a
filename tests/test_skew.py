"""Salted join: result parity with a plain join + replica balance."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_project_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of probe rows share key 1
    probe = spark.createDataFrame(
        [(1 if i % 10 else 2, i, float(i)) for i in range(1000)],
        "k int, probe_id int, v double",
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "miss")], "k int, tag string")
    got = salted_join(probe, build, "k", salt=8)
    want = probe.join(build, "k")
    assert got.count() == want.count() == 1000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """Drive the REAL operator and observe the physical spread: with
    one hot key, the joined output must land across many partitions
    (the join shuffles on (key, _salt)), not one."""
    probe = spark.createDataFrame(
        [(1, i) for i in range(1000)], "k int, probe_id int"
    )
    build = spark.createDataFrame([(1, "hot")], "k int, tag string")
    # AQE would coalesce the tiny post-join partitions and hide the
    # spread we're asserting on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = salted_join(probe, build, "k", salt=8).withColumn(
            "_pid", F.spark_partition_id()
        )
        per_part = [r["count"] for r in out.groupBy("_pid").count().collect()]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert sum(per_part) == 1000
    assert len(per_part) >= 4  # the hot key spread across partitions
    assert max(per_part) < 1000 * 0.5  # no single partition hogs it
