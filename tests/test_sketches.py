"""heavy_hitters: the two-pass Misra-Gries extraction must return
EXACTLY the tokens the full-vocabulary groupBy would, at any
partitioning, with exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.sketches import heavy_hitters
from stock_data_project_spark.operators.textops import words
from tests.conftest import SF_SMOKE


def _exact(spark, docs, min_fraction):
    tokens = docs.select(F.explode(words("text")).alias("token")).filter(
        F.col("token") != ""
    )
    total = tokens.count()
    return {
        (r["token"], r["n"])
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= total * min_fraction)
        .collect()
    }


def test_heavy_hitters_match_exact_groupby(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    for frac in (0.01, 0.002):
        truth = _exact(spark, docs, frac)
        got = {(r["token"], r["n"]) for r in heavy_hitters(docs, frac).collect()}
        assert got == truth, (frac, len(got), len(truth))
        assert truth  # the threshold actually selects something


def test_heavy_hitters_partition_invariant(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    base = {(r["token"], r["n"]) for r in heavy_hitters(docs, 0.005).collect()}
    re16 = {
        (r["token"], r["n"])
        for r in heavy_hitters(docs.repartition(16), 0.005).collect()
    }
    assert base == re16
    # fractions are exact corpus fractions, not sketch estimates
    out = heavy_hitters(docs, 0.005)
    n_total = (
        docs.select(F.explode(words("text")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    for r in out.collect():
        assert r["fraction"] == round(r["n"] / n_total, 6)
