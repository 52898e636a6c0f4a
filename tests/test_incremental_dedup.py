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


def test_ngram_contamination_flags_only_true_overlap(spark):
    """Docs sharing an 8-token shingle with the benchmark are flagged
    with the right distinct-gram count; clean docs are absent; short
    benchmark rows match via the whole-text fallback."""
    from pyspark.sql import functions as F

    from stock_data_project_spark.operators.dedup import ngram_contamination

    docs = _docs(spark)
    # benchmark = verbatim windows lifted from two real docs + noise
    picked = docs.filter(F.col("doc_id").isin(3, 7)).select("doc_id", "text").collect()
    snippets = []
    for r in picked:
        toks = r["text"].split()
        assert len(toks) >= 10
        snippets.append(" ".join(toks[1:9]))  # an interior 8-token window
    bench = spark.createDataFrame(
        [(s,) for s in snippets] + [("completely novel benchmark sentence here",)],
        "text string",
    )
    out = {r["doc_id"]: r["n_matched_grams"] for r in
           ngram_contamination(docs, bench).collect()}
    assert 3 in out and 7 in out
    for d in (3, 7):
        assert out[d] >= 1
    # docs that never contained the snippets are not flagged: the
    # flagged set is small relative to the corpus
    assert len(out) < docs.count() * 0.2
    # exact short-text contamination via the whole-text fallback
    short_doc = spark.createDataFrame([(1, "tiny leak"), (2, "safe")],
                                      "doc_id long, text string")
    short_bench = spark.createDataFrame([("tiny leak",)], "text string")
    got = {r["doc_id"] for r in ngram_contamination(short_doc, short_bench).collect()}
    assert got == {1}
