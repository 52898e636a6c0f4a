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
    probe = spark.createDataFrame(
        [(1, i) for i in range(1000)], "k int, probe_id int"
    )
    salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(8)).cast("int")
    )
    per_salt = salted.groupBy("_salt").count().collect()
    assert len(per_salt) == 8  # every replica sees traffic
    assert max(r["count"] for r in per_salt) < 1000 * 0.3  # no replica hogs
