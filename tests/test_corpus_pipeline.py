"""End-to-end training-corpus builder: the composed gates must hold
simultaneously on the written output — unique content, no benchmark
leakage, split fractions, bin budgets — and the whole run must be
deterministic across re-runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.corpus import build_training_corpus
from tests.conftest import SF_SMOKE

BUDGET = 256


def _run(spark, tmp_path, name):
    docs = load_table(spark, SF_SMOKE, "documents")
    picked = docs.filter(F.col("doc_id").isin(11, 13)).select("text").collect()
    bench = spark.createDataFrame([(r["text"],) for r in picked], "text string")
    out = str(tmp_path / name)
    stats = build_training_corpus(
        spark,
        docs,
        out,
        benchmark=bench,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        max_per_source=20,
        seq_budget=BUDGET,
    )
    return docs, out, stats


def test_all_gates_hold_on_the_written_corpus(spark, tmp_path):
    docs, out, stats = _run(spark, tmp_path, "corpus")
    written = spark.read.parquet(out)

    # stats agree with what landed on disk
    assert written.count() == stats["kept"] == sum(stats["per_split"].values())
    assert 0 < stats["kept"] < stats["input"]

    # partitioned layout by split
    assert {d for d in os.listdir(out) if d.startswith("split=")} == {
        "split=train",
        "split=val",
        "split=test",
    }

    # unique content survived dedup
    assert written.select("content_hash").distinct().count() == written.count()

    # benchmark docs (verbatim leaks) are gone
    assert written.filter(F.col("doc_id").isin(11, 13)).count() == 0

    # per-source cap respected within binomial slack (rate-based)
    per_src = written.groupBy("source").count().collect()
    assert max(r["count"] for r in per_src) <= 20 + 15

    # split fractions near the 80/10/10 request
    kept = stats["kept"]
    assert abs(stats["per_split"]["train"] / kept - 0.8) < 0.1

    # packing: every (split, bin_id) bin within budget unless
    # oversize (bin_id is namespaced per split — the bin key is the
    # pair, matching the one-split-at-a-time loader layout)
    bad_bins = (
        written.filter(~F.col("oversize"))
        .groupBy("split", "bin_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .filter(F.col("tok") > BUDGET)
        .count()
    )
    assert bad_bins == 0


def test_pipeline_is_deterministic(spark, tmp_path):
    _, out_a, stats_a = _run(spark, tmp_path, "a")
    _, out_b, stats_b = _run(spark, tmp_path, "b")
    assert stats_a == stats_b
    a = spark.read.parquet(out_a).select("doc_id", "split", "bin_id")
    b = spark.read.parquet(out_b).select("doc_id", "split", "bin_id")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
