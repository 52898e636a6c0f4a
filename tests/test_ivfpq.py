"""IVF+PQ composition: the nprobe=n_cells equivalence limit vs plain
PQ search, routing-bound recall with re-rank, scan-fraction gating
(only probed cells' rows can surface), and Arrow-off construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.ivfpq import ivfpq_topk
from stock_data_project_spark.operators.similarity import cosine_topk
from tests.conftest import SF_ORACLE

K = 5
NQ = 10


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings").cache()


def _recall(approx, exact):
    es = exact.groupby("query_id")["neighbor_id"].agg(set)
    as_ = approx.groupby("query_id")["neighbor_id"].agg(set)
    return sum(len(as_.get(q, set()) & es[q]) for q in es.index) / (
        K * len(es)
    )


def test_all_cells_probed_equals_pq_with_rerank(spark, emb):
    """nprobe == n_cells degenerates to plain PQ search: with the
    same codebook parameters and full re-rank pool the output must
    match exact brute force wherever PQ-with-rerank does (recall
    ≈ 1.0 — the routing term drops out)."""
    queries = emb.filter(F.col("vec_id") < NQ)
    out = ivfpq_topk(
        emb, queries, k=K, n_centroids=16, nprobe=16, m=16, nbits=6,
        rerank=50,
    ).toPandas()
    exact = cosine_topk(emb, queries, k=K).toPandas()
    assert len(out) == NQ * K
    assert _recall(out, exact) >= 0.9


def test_routing_bound_recall(spark, emb):
    """Default data-adaptive routing on the adversarial near-uniform
    corpus: recall tracks ivf_topk's documented ~0.60 routing floor
    (re-rank absorbs PQ noise, routing misses remain)."""
    queries = emb.filter(F.col("vec_id") < NQ)
    out = ivfpq_topk(emb, queries, k=K, m=16, nbits=6, rerank=50).toPandas()
    exact = cosine_topk(emb, queries, k=K).toPandas()
    assert _recall(out, exact) >= 0.4
    # every query still gets a full result set (probed cells are
    # never empty: the query's own nearest cells)
    assert out.groupby("query_id").size().eq(K).all()


def test_single_probe_only_surfaces_own_cell(spark, emb):
    """nprobe=1: every returned neighbor must share the query's
    nearest cell — the kernel's per-query gate, not just the global
    isin prefilter, must hold."""
    from stock_data_project_spark.operators.ivf import ivf_fit, ivf_transform

    queries = emb.filter(F.col("vec_id") < 3)
    out = ivfpq_topk(
        emb, queries, k=K, n_centroids=16, nprobe=1, m=16, nbits=6
    ).toPandas()
    centroids = ivf_fit(emb, 16)
    cells = {
        r[0]: r[1]
        for r in ivf_transform(emb, centroids, 1)
        .select("vec_id", "centroid_id")
        .collect()
    }
    for _, row in out.iterrows():
        assert cells[row["neighbor_id"]] == cells[row["query_id"]], row


def test_ivfpq_runs_with_arrow_disabled(spark, emb):
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        queries = emb.filter(F.col("vec_id") < 3)
        out = ivfpq_topk(emb, queries, k=3, m=16, nbits=6)
        assert out.count() == 9
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)
