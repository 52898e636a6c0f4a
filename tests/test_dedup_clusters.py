"""Connected components over near-dup pairs: cluster assignment must
match a Python union-find on the same edge list — across chains
(transitivity), stars, singleton edges, and the planted-duplicate
corpus end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.operators.dedup import dedup_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots
    return {x: find(x) for x in parent}


def _got(spark, edges):
    df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    out = dedup_clusters(df).collect()
    return {r["member_id"]: r["cluster_id"] for r in out}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4), (4, 5)],  # chain: transitivity
        [(10, 1), (10, 2), (10, 3)],  # star centered off-min
        [(1, 2), (3, 4), (5, 6)],  # disjoint pairs
        [(2, 1), (1, 2), (2, 2)],  # duplicates + self-loop
        [(i, i + 1) for i in range(1, 40)],  # long chain, log-round stress
        [(1, 2), (2, 3), (10, 11), (11, 12), (3, 10)],  # merge two chains
    ],
)
def test_matches_union_find(spark, edges):
    want = _union_find(edges)
    # drop self-loop-only nodes from the expectation (no real edge)
    want = {k: v for k, v in want.items() if any(a != b and k in (a, b) for a, b in edges)}
    got = _got(spark, edges)
    assert got == want


def test_min_id_is_cluster_id_and_total_coverage(spark):
    edges = [(7, 3), (3, 9), (100, 101), (5, 5)]
    got = _got(spark, edges)
    assert got == {3: 3, 7: 3, 9: 3, 100: 100, 101: 100}


def test_planted_duplicate_corpus_end_to_end(spark):
    """Three texts, each planted 3× with distinct ids → jaccard pairs
    → clusters: every copy lands in its text's cluster, cluster_id =
    min planted id."""
    from stock_data_project_spark.operators.dedup import blocked_jaccard_pairs

    texts = [
        "spark shuffles the hash partitioned rows across the cluster nodes",
        "duckdb vectorizes the scan over the parquet row groups quickly",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    rows = [
        (ti * 100 + c, t, "en", "src", len(t))
        for ti, t in enumerate(texts)
        for c in range(3)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs = blocked_jaccard_pairs(docs, threshold=0.9)
    got = {
        r["member_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()
    }
    assert got == {ti * 100 + c: ti * 100 for ti in range(3) for c in range(3)}
