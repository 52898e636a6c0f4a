"""operators/pairs.series_pairs — the quadratic-pair scale path.

Pins: (1) graded-size series take the EXACT C(n,2) path (bit-equal
pair set, so the oracled estimators are untouched); (2) long series
take the sampled path with bounded pair volume; (3) the sample is
deterministic under repartitioning (purpose-salted hash, no RNG);
(4) the sampled estimators land near the exact ones on a synthetic
long series; (5) a mixed frame routes each series to its own branch.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from stock_data_project_spark.operators.pairs import series_pairs


def _mk(spark, rows):
    return spark.createDataFrame(rows, "series_key string, rn int, v double")


def _linear_series(key, n, slope=0.5, bias=10.0):
    # deterministic "noise" from a fixed table of offsets — no RNG in
    # tests either
    offs = [0.0, 0.7, -0.4, 0.2, -0.9, 0.5, -0.1, 0.8, -0.6, 0.3]
    return [
        (key, i, bias + slope * i + offs[i % len(offs)]) for i in range(1, n + 1)
    ]


def test_exact_path_is_full_enumeration(spark):
    rows = _linear_series("s", 30)
    got = {
        (r["a_rn"], r["b_rn"])
        for r in series_pairs(_mk(spark, rows), ["v"]).collect()
    }
    want = {(a, b) for a, b in itertools.combinations(range(1, 31), 2)}
    assert got == want


def test_sampled_path_bounds_and_determinism(spark):
    rows = _linear_series("s", 400)
    df = _mk(spark, rows)
    p1 = series_pairs(df, ["v"]).collect()
    ids1 = {(r["a_rn"], r["b_rn"]) for r in p1}
    # bounded: at most n*m sampled pairs, far below C(400,2)=79800
    assert len(ids1) <= 400 * 32
    assert len(ids1) >= 400 * 8  # and not degenerate
    assert all(a < b for a, b in ids1)
    # deterministic under a different partitioning
    ids2 = {
        (r["a_rn"], r["b_rn"])
        for r in series_pairs(df.repartition(17), ["v"]).collect()
    }
    assert ids1 == ids2


def test_mixed_frame_routes_per_series(spark):
    rows = _linear_series("short", 20) + _linear_series("long", 300)
    out = series_pairs(_mk(spark, rows), ["v"]).groupBy("series_key").count()
    n = {r["series_key"]: r["count"] for r in out.collect()}
    assert n["short"] == 20 * 19 // 2  # exact branch
    assert n["long"] < 300 * 299 // 2  # sampled branch engaged


def test_sampled_median_slope_near_exact(spark):
    rows = _linear_series("s", 400, slope=0.5)
    pairs = series_pairs(_mk(spark, rows), ["v"]).withColumn(
        "slope",
        (F.col("b_v") - F.col("a_v")) / (F.col("b_rn") - F.col("a_rn")),
    )
    (med,) = pairs.agg(F.expr("percentile(slope, 0.5)")).first()
    # true pairwise-median slope of the linear+offsets series is ~0.5
    assert abs(med - 0.5) < 0.05
