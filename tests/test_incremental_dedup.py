"""incremental_dedup semantics + the bucketed-history scale layout:
cross-run drops, within-batch collapse, idempotent re-ingest, and the
Exchange-free history side that keeps the anti join batch-priced no
matter how large the store grows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.dedup import incremental_dedup
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_first_run_equals_within_batch_dedup(spark):
    docs = _docs(spark)
    survivors, new_hist = incremental_dedup(docs)
    from stock_data_project_spark.operators.textops import normalized

    n_contents = (
        docs.filter(F.col("text").isNotNull())
        .select(F.md5(normalized("text")))
        .distinct()
        .count()
    )
    assert survivors.count() == n_contents
    assert new_hist.count() == n_contents
    # keeper = min doc_id per content (same rule as exact_duplicates)
    keep_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    from stock_data_project_spark.operators.dedup import exact_duplicates

    assert keep_ids == {
        r["keeper_id"] for r in exact_duplicates(docs).select("keeper_id").collect()
    }


def test_cross_run_drops_and_idempotence(spark):
    docs = _docs(spark)
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch2 = docs  # includes all of batch1's content again
    s1, h1 = incremental_dedup(batch1)
    history = h1.cache()
    try:
        s2, h2 = incremental_dedup(batch2, history)
        # nothing already in history survives run 2
        seen = {r["content_hash"] for r in history.collect()}
        assert all(r["content_hash"] not in seen for r in s2.collect())
        # union covers every distinct content exactly once
        all_hashes = {r["content_hash"] for r in h2.collect()} | seen
        s_all, _ = incremental_dedup(docs)
        assert all_hashes == {r["content_hash"] for r in s_all.collect()}
        # idempotence: re-ingesting batch2 against the grown store keeps nothing
        s3, _ = incremental_dedup(batch2, history.union(h2))
        assert s3.count() == 0
    finally:
        history.unpersist()


def test_null_text_never_admitted_or_collapsed(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, None), (3, None), (4, "same text")],
        "doc_id long, text string",
    )
    survivors, hist = incremental_dedup(df)
    rows = {r["doc_id"] for r in survivors.collect()}
    assert rows == {1}  # NULLs dropped, 4 collapsed into 1
    assert hist.count() == 1


@pytest.mark.filterwarnings("ignore")
def test_bucketed_history_side_has_no_exchange(spark):
    """The 100 TB invariant: history bucketed on content_hash is read
    in place — only the (small) daily batch shuffles."""
    from stock_data_project_spark.sources import write_bucketed

    docs = _docs(spark)
    _, hist = incremental_dedup(docs.filter(F.col("doc_id") % 2 == 0))
    spark.sql("DROP TABLE IF EXISTS h_dedup")
    try:
        write_bucketed(hist, "h_dedup", "content_hash", 8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        survivors, _ = incremental_dedup(docs, spark.table("h_dedup"))
        plan = survivors._jdf.queryExecution().executedPlan().toString()
        # exactly one Exchange: the batch side keying up to the
        # bucket layout; the window collapse reuses that partitioning
        # (ClusteredDistribution is satisfied by the join's hash)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert survivors.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS h_dedup")
