"""DataFrame-native Bloom filter: no false negatives ever, bounded
false positives, NULL/partitioning behavior, SQL-lockstep hashing."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_project_spark.operators.bloom import (
    bloom_build,
    bloom_filter,
    bloom_might_contain,
    bloom_positions_sql,
)

_BITS, _K = 1 << 12, 5


def test_no_false_negatives_and_bounded_fp(spark):
    build = spark.range(0, 300).select((F.col("id") * 7 + 3).alias("key"))
    bitmap = bloom_build(build, "key", _BITS, _K)
    # every build key must pass — a Bloom filter NEVER false-negatives
    assert bloom_filter(build, "key", bitmap, _BITS, _K).count() == 300
    # probe a disjoint key range; FP rate ~(1-e^{-kn/m})^k ≈ 0.9% here
    probe = spark.range(10_000, 20_000).select(F.col("id").alias("key"))
    fp = bloom_filter(probe, "key", bitmap, _BITS, _K).count()
    assert fp < 10_000 * 0.05  # generous 5x the expected rate


def test_bitmap_deterministic_under_partitioning(spark):
    build = spark.range(0, 500).select(F.col("id").alias("key"))
    a = bloom_build(build, "key", _BITS, _K)
    b = bloom_build(build.repartition(13), "key", _BITS, _K)
    assert a == b  # bit_or is commutative — layout can't change bits


def test_null_keys_skipped_and_dropped(spark):
    build = spark.createDataFrame([(1,), (None,)], "key long")
    bitmap = bloom_build(build, "key", _BITS, _K)
    probe = spark.createDataFrame([(1,), (None,), (999_999,)], "key long")
    kept = [r.key for r in bloom_filter(probe, "key", bitmap, _BITS, _K).collect()]
    assert 1 in kept
    assert None not in kept  # NULL never equi-joins → prune it too


def test_positions_sql_matches_columns(spark):
    """The oracle-side SQL expressions must produce the identical
    positions as the Column implementation — the lockstep that makes
    the graded key fully oracled."""
    import duckdb

    from stock_data_project_spark.operators.bloom import bloom_positions

    keys = spark.createDataFrame(
        [(k,) for k in (1, 7, 12345, 2**31 - 1, -1, -98765)], "key long"
    )
    got = keys.select(
        "key", F.array(*bloom_positions(F.col("key"), _BITS, _K)).alias("pos")
    ).collect()
    exprs = ", ".join(bloom_positions_sql("key", _BITS, _K))
    con = duckdb.connect()
    want = {
        r[0]: list(r[1])
        for r in con.sql(
            "SELECT key, [" + exprs + "] FROM (SELECT unnest([1, 7, 12345, "
            f"{2**31 - 1}, -1, -98765]) AS key)"
        ).fetchall()
    }
    for r in got:
        assert list(r.pos) == want[r.key], r.key


def test_might_contain_is_codegen_only(spark):
    """The probe-side test must stay a pure expression — no join, no
    exchange, no Python — so it can sit under the scan filter."""
    build = spark.range(0, 50).select(F.col("id").alias("key"))
    bitmap = bloom_build(build, "key", _BITS, _K)
    probe = spark.range(0, 1000).select(F.col("id").alias("key"))
    plan = (
        bloom_filter(probe, "key", bitmap, _BITS, _K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bitmap_cache_skips_the_build_job(spark, tmp_path):
    """A cache_key memoizes the bitmap per (key, col, m, k): the
    steady-state call must not re-run the build job. Proven by
    overwriting the build data between calls — only a skipped job can
    return the ORIGINAL bitmap."""

    from stock_data_project_spark.operators.bloom import _BITMAP_CACHE

    p = str(tmp_path / "bk.parquet")
    spark.range(100).selectExpr("id AS k").write.parquet(p)
    ck = ("test_bitmap_cache", p)
    first = bloom_build(spark.read.parquet(p), "k", 1 << 10, 3, cache_key=ck)
    # overwrite the build data: a recompute would now yield a
    # DIFFERENT bitmap, so getting the old one back proves the job
    # was skipped (the documented caller-owns-key-freshness contract)
    spark.range(5000, 5100).selectExpr("id AS k").write.mode(
        "overwrite"
    ).parquet(p)
    recomputed = bloom_build(spark.read.parquet(p), "k", 1 << 10, 3)
    assert recomputed != first
    again = bloom_build(spark.read.parquet(p), "k", 1 << 10, 3, cache_key=ck)
    assert again == first
    # the memo hands out COPIES — a caller mutating its list must not
    # poison later probes
    again[0] ^= 0xFF
    assert bloom_build(
        spark.read.schema("k long").parquet(p), "k", 1 << 10, 3, cache_key=ck
    ) == first
    # different (m, k) under the same cache_key is a different memo slot
    assert (ck, "k", 1 << 10, 3) in _BITMAP_CACHE
    _BITMAP_CACHE.pop((ck, "k", 1 << 10, 3))
