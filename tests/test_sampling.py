"""Deterministic sampling operators: split stability under
repartitioning (the exact property randomSplit lacks), fraction
accuracy, and remix mixture convergence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.sampling import hash_split, remix_corpus
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


def test_hash_split_fractions_and_coverage(spark, docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive, no dropped rows
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts["val"] / n - 0.1) < 0.05
    assert abs(counts["test"] / n - 0.1) < 0.05


def test_hash_split_stable_across_partitioning(spark, docs):
    """The whole point vs randomSplit: membership is a pure function
    of (id, seed), so ANY repartitioning yields the identical
    assignment."""
    w = {"train": 0.9, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17, "lang"), w).collect()
    }
    assert a == b
    # and a different seed re-draws (at least some rows move)
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, w, seed=7).collect()}
    assert a != c


def test_hash_split_single_bucket(spark, docs):
    out = hash_split(docs, {"all": 1.0})
    assert out.filter(F.col("split") != "all").count() == 0


def test_remix_hits_target_mixture(spark, docs):
    """Remix to uniform across sources: kept counts match s·t_d
    within hash noise, and no domain is up-sampled."""
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    target = {s: 1.0 / len(sources) for s in sources}
    out = remix_corpus(docs, target, domain_col="source")
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    orig = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the scarcest domain sets the scale: it is kept (nearly) whole
    scarcest = min(orig, key=orig.get)
    assert kept[scarcest] >= orig[scarcest] * 0.9
    # every domain is within hash noise of the scarcest's count
    for s in sources:
        assert kept[s] <= orig[s]  # never up-sampled
        assert abs(kept[s] - kept[scarcest]) <= max(25, 0.2 * kept[scarcest])
    # schema is unchanged (helper columns dropped)
    assert out.columns == docs.columns


def test_remix_drops_unlisted_domains(spark, docs):
    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    out = remix_corpus(docs, {sources[0]: 1.0}, domain_col="source")
    assert out.select("source").distinct().collect()[0]["source"] == sources[0]


def test_remix_is_deterministic(spark, docs):
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    target = {s: 1.0 / len(sources) for s in sources}
    a = sorted(r["doc_id"] for r in remix_corpus(docs, target).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in remix_corpus(docs, target).select("doc_id").collect())
    assert a == b


def test_hash_split_zero_shuffles(spark, docs):
    plan = (
        hash_split(docs, {"train": 0.8, "test": 0.2})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_cap_per_key_exact(spark, docs):
    from stock_data_project_spark.operators.sampling import cap_per_key

    capped = cap_per_key(docs, 30, exact=True)
    per = capped.groupBy("source").count().collect()
    src_n = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert {r["source"]: r["count"] for r in per} == {
        s: min(30, c) for s, c in src_n.items()
    }
    # deterministic: repartitioning does not change membership
    again = cap_per_key(docs.repartition(7), 30, exact=True)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == {
        r["doc_id"] for r in capped.select("doc_id").collect()
    }


def test_cap_per_key_approx_tracks_cap_and_is_stable(spark, docs):
    from stock_data_project_spark.operators.sampling import cap_per_key

    capped = cap_per_key(docs, 50)
    src_n = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    per = {r["source"]: r["count"] for r in capped.groupBy("source").count().collect()}
    for s, n_k in src_n.items():
        kept = per.get(s, 0)
        if n_k <= 50:
            assert kept == n_k  # rate 1.0 keeps everything
        else:
            assert abs(kept - 50) <= 25, (s, kept)  # binomial, ~3.5 sd
    again = cap_per_key(docs.repartition(9), 50)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == {
        r["doc_id"] for r in capped.select("doc_id").collect()
    }


def test_cap_per_key_data_path_is_map_only(spark, docs):
    """The data side must stay broadcast-join + filter: exactly one
    Exchange in the whole plan (the k-row count agg feeding rates)."""
    from stock_data_project_spark.operators.sampling import cap_per_key

    plan = (
        cap_per_key(docs, 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_composed_cap_then_split_stays_uniform(spark, docs):
    """Composition regression: cap_per_key and hash_split must draw
    from INDEPENDENT hash streams. With a shared stream, capping
    keeps exactly the rows with u < rate and the split thresholds the
    same u — the upper split bands (val/test) come out empty."""
    from stock_data_project_spark.operators.sampling import cap_per_key, hash_split

    capped = cap_per_key(docs, 15)  # rate < 1 for every 25-doc source
    routed = hash_split(capped, {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["count"] for r in routed.groupBy("split").count().collect()}
    kept = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}, counts
    # binomial slack around 5% of ~300 kept rows
    for small in ("val", "test"):
        assert counts[small] >= max(2, 0.01 * kept), counts


def test_cap_per_key_keeps_null_key_rows(spark):
    """NULL-key rows form a real group (groupBy semantics) and must
    be capped like any other — the approximate path's join has to be
    null-safe or it silently drops them entirely while exact=True
    keeps them (ADVICE r3: the two modes returned different row
    sets for the same input)."""
    from stock_data_project_spark.operators.sampling import cap_per_key

    rows = [(i, None if i < 40 else "a") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    approx = cap_per_key(df, 25, key_cols="source").collect()
    exact = cap_per_key(df, 25, key_cols="source", exact=True).collect()
    null_approx = [r for r in approx if r["source"] is None]
    null_exact = [r for r in exact if r["source"] is None]
    # exact caps NULL group at 25; approx keeps a hash-rate sample of it
    assert len(null_exact) == 25
    assert 0 < len(null_approx) <= 40
    # approx keeps the SAME rows regardless of partitioning
    again = cap_per_key(df.repartition(7), 25, key_cols="source").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in approx)
