"""r13-built keys staged for the r14 window: classifier_calibration
(llm_next16) and stream_ingest_neardup (stream_next12) — driver-
identical parity, semantic pins (confusion-table invariants, planted
near-dup rejection, within-batch winner election), and the Arrow-off
guard every createDataFrame-crossing key ships with."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_data_project_spark.plans import llm_next16, stream_next12
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


# ------------------------------------------------ classifier_calibration


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_classifier_calibration_parity(spark, sf):
    df = llm_next16.QUERIES_NEXT["classifier_calibration"](spark, sf)
    assert_gradable_schema(df, "classifier_calibration")
    assert df.count() == len(llm_next16._THRESHOLDS)
    compare(
        df, duckdb_run(llm_next16.ORACLE_NEXT["classifier_calibration"], sf)
    )


def test_calibration_confusion_invariants(spark):
    rows = {
        r["threshold"]: r
        for r in llm_next16.QUERIES_NEXT["classifier_calibration"](
            spark, SF_ORACLE
        ).collect()
    }
    totals = {
        t: r["tp"] + r["fp"] + r["fn"] + r["tn"] for t, r in rows.items()
    }
    # the corpus is fixed: every threshold partitions the same docs
    assert len(set(totals.values())) == 1
    thrs = sorted(rows)
    for lo, hi in zip(thrs, thrs[1:]):
        # raising the threshold can only shrink the predicted-positive set
        assert rows[hi]["tp"] <= rows[lo]["tp"]
        assert rows[hi]["fp"] <= rows[lo]["fp"]
    # the sweep is non-degenerate on the graded corpus: some threshold
    # actually separates (0 < tp < tp+fn somewhere)
    assert any(0 < r["tp"] < r["tp"] + r["fn"] for r in rows.values())


def test_calibration_null_metrics_only_when_undefined(spark):
    for r in llm_next16.QUERIES_NEXT["classifier_calibration"](
        spark, SF_ORACLE
    ).collect():
        assert (r["precision"] is None) == (r["tp"] + r["fp"] == 0)
        assert (r["recall"] is None) == (r["tp"] + r["fn"] == 0)
        assert (r["f1"] is None) == (2 * r["tp"] + r["fp"] + r["fn"] == 0)


def test_calibration_runs_with_arrow_disabled(spark):
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = llm_next16.QUERIES_NEXT["classifier_calibration"](
            spark, SF_SMOKE
        ).collect()
        assert len(rows) == len(llm_next16._THRESHOLDS)
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)


# ------------------------------------------------ stream_ingest_neardup


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_stream_ingest_neardup_parity(spark, sf):
    df = stream_next12.QUERIES_NEXT["stream_ingest_neardup"](spark, sf)
    assert_gradable_schema(df, "stream_ingest_neardup")
    compare(
        df, duckdb_run(stream_next12.ORACLE_NEXT["stream_ingest_neardup"], sf)
    )


def test_lsh_gate_rejects_exact_and_near_dups_cross_batch(spark):
    """A doc identical to an admitted one shares EVERY band
    (identical text ⇒ identical signature — a guarantee, not a
    probability); a near-dup sharing most shingles collides on at
    least one band for this pinned construction (fixed salts make the
    outcome deterministic for fixed text). An unrelated doc passes."""
    from stock_data_project_spark.operators.dedup import (
        lsh_gate,
        neutral_minhash_bands,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pandas watch from a bamboo grove near the old river "
        "crossing at dawn"
    )
    near = base.replace("seventeen", "nineteen")
    other = (
        "completely different content about distributed query engines "
        "and the economics of columnar storage formats in modern "
        "analytical databases at petabyte scale"
    )
    history = neutral_minhash_bands(
        spark.createDataFrame([(1, base)], "doc_id long, text string")
    ).localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [(10, base), (11, near), (12, other)], "doc_id long, text string"
    )
    admitted, _, rej_hist, rej_batch = lsh_gate(batch, history)
    assert {r["doc_id"] for r in admitted.collect()} == {12}
    assert {r["doc_id"] for r in rej_hist.collect()} == {10, 11}
    assert rej_batch.count() == 0


def test_lsh_gate_within_batch_winner_election(spark):
    """Two identical docs in ONE batch: the smaller id wins every
    band bucket and is admitted; the larger is rejected
    within-batch. NULL text is excluded entirely."""
    from stock_data_project_spark.operators.dedup import lsh_gate

    batch = spark.createDataFrame(
        [(5, "alpha beta gamma delta epsilon zeta"),
         (9, "alpha beta gamma delta epsilon zeta"),
         (7, None)],
        "doc_id long, text string",
    )
    admitted, admitted_bands, rej_hist, rej_batch = lsh_gate(batch, None)
    assert {r["doc_id"] for r in admitted.collect()} == {5}
    assert {r["doc_id"] for r in rej_batch.collect()} == {9}
    assert rej_hist.count() == 0
    # the committed store receives ONLY the winner's bands
    assert {r["doc_id"] for r in admitted_bands.collect()} == {5}


def test_neutral_bands_engine_parity(spark):
    """The md5-derived band signatures are bit-identical between the
    Spark operator and the oracle's SQL construction — the property
    the whole gate's oracle-ability rests on."""
    import duckdb

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.dedup import neutral_minhash_bands

    docs = load_table(spark, SF_SMOKE, "documents")
    got = sorted(
        (r["doc_id"], r["band_idx"], r["band_sig"])
        for r in neutral_minhash_bands(docs).collect()
    )
    sql = stream_next12._neardup_gate_sql()
    prefix = sql[: sql.index("), p0 AS")] + ")"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), c)
        for a, b, c in con.sql(
            prefix + " SELECT doc_id, band_idx, sig FROM bandrows"
        ).fetchall()
    )
    assert got == want


def test_stream_ingest_neardup_runs_with_arrow_disabled(spark):
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = stream_next12.QUERIES_NEXT["stream_ingest_neardup"](
            spark, SF_SMOKE
        ).collect()
        assert len(rows) == 3
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)
