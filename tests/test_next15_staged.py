"""r12-built graph-ANN key staged for the r13 window (llm_next15
knn_graph): driver-identical parity (the oracle replays the
NN-Descent iteration exactly, so this is an algorithm-level grade),
recall quality vs the exact brute-force graph (the statistical
property the oracle can't state), determinism, and the
Arrow-disabled guard every pandas-crossing key ships with."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans import llm_next15
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_key_is_oracled():
    assert set(llm_next15.QUERIES_NEXT) == set(llm_next15.ORACLE_NEXT)


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_knn_graph_parity(spark, sf):
    df = llm_next15.QUERIES_NEXT["knn_graph"](spark, sf)
    assert_gradable_schema(df, "knn_graph")
    assert df.count() > 0
    compare(df, duckdb_run(llm_next15.ORACLE_NEXT["knn_graph"], sf))


def test_knn_graph_recall_on_clustered_corpus(spark):
    """NN-Descent's convergence premise is LOCAL STRUCTURE (a
    neighbor of a neighbor is likely a neighbor). On a clustered
    corpus — every production embedding space — the 4-round graph
    must recover the exact top-5 with high recall (measured 0.948 at
    build time; a routing/expansion regression lands far below the
    0.85 floor). The graded corpus can't carry this pin: see the
    companion test below."""
    import numpy as np

    from stock_data_project_spark.operators.nndescent import knn_graph

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(10):
        for j in range(20):
            v = centers[c] + 0.08 * rng.normal(size=64)
            rows.append((c * 20 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = np.stack([np.asarray(r[1]) for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2)
    exact = {i: set(np.argsort(sims[i])[-5:]) for i in range(len(rows))}
    got: dict[int, set] = {}
    for r in knn_graph(df, k=5, iters=4).collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    recall = float(
        np.mean([len(got.get(i, set()) & exact[i]) / 5 for i in exact])
    )
    assert recall >= 0.85, f"clustered recall@5 = {recall:.3f}"


def test_knn_graph_beats_random_on_unstructured_corpus(spark):
    """The graded embeddings are near-uniform random in 64-d (probed:
    same-label cosine 0.002 vs cross-label 0.0; exact top-5 share the
    label at chance) — the curse-of-dimensionality WORST case, where
    no local-graph method converges fast and absolute recall is
    necessarily modest. The honest pin: the 3-round graph must still
    beat the random-graph baseline (5/499 ≈ 1%) by an order of
    magnitude (measured 0.149 at build time)."""
    from pyspark.sql import functions as F

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.similarity import cosine_topk

    emb = load_table(spark, SF_ORACLE, "embeddings")
    got = llm_next15.QUERIES_NEXT["knn_graph"](spark, SF_ORACLE)
    exact = cosine_topk(emb, emb, k=llm_next15._K)
    hits = got.join(
        exact.select(
            F.col("query_id").alias("vec_id"),
            F.col("neighbor_id"),
        ),
        ["vec_id", "neighbor_id"],
        "left_semi",
    ).count()
    recall = hits / exact.count()
    assert recall >= 0.08, f"unstructured recall@{llm_next15._K} = {recall:.3f}"


def test_knn_graph_shape_invariants(spark):
    from pyspark.sql import functions as F

    df = llm_next15.QUERIES_NEXT["knn_graph"](spark, SF_ORACLE)
    row = df.agg(
        F.max("rank").alias("mx"),
        F.min("cosine_sim").alias("mn_sim"),
        F.max("cosine_sim").alias("mx_sim"),
        F.sum((F.col("vec_id") == F.col("neighbor_id")).cast("int")).alias(
            "self_loops"
        ),
    ).collect()[0]
    assert row["mx"] <= llm_next15._K
    assert row["self_loops"] == 0
    assert -1.0 <= row["mn_sim"] and row["mx_sim"] <= 1.0
    # per-source neighbor lists are rank-dense: count == max rank
    bad = (
        df.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("c"), F.max("rank").alias("m"))
        .filter(F.col("c") != F.col("m"))
        .count()
    )
    assert bad == 0


def test_knn_graph_runs_with_arrow_disabled(spark):
    """The driver's verifier session does NOT enable Arrow — the
    repo rule: any new pandas-crossing key must run (and collect)
    under arrow.pyspark.enabled=false before shipping (mapInPandas
    itself is always Arrow; this guards the collection path)."""
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = llm_next15.QUERIES_NEXT["knn_graph"](spark, SF_SMOKE).collect()
        assert len(rows) > 0
        assert isinstance(rows[0]["cosine_sim"], float)
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)


# ------------------------------------------------- graph_ann_search


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_graph_ann_search_parity(spark, sf):
    df = llm_next15.QUERIES_NEXT["graph_ann_search"](spark, sf)
    assert_gradable_schema(df, "graph_ann_search")
    assert df.count() > 0
    compare(df, duckdb_run(llm_next15.ORACLE_NEXT["graph_ann_search"], sf))


def test_graph_search_clustered_recall_and_graph_floor(spark):
    """On a clustered corpus (every production embedding space) the
    warm-started beam search must (a) recover the exact top-5 with
    high recall and (b) NEVER do worse than the graph it navigates —
    the warm start makes scored_final ⊇ the query's graph edges, so
    search recall ≥ graph recall is a construction guarantee, not a
    statistical hope. The clusters keep all k edges in-cluster (the
    graph is DISCONNECTED), so this also pins that the warm start —
    not the global entry — is what carries cross-component queries."""
    import numpy as np

    from stock_data_project_spark.operators.graphsearch import graph_beam_search
    from stock_data_project_spark.operators.nndescent import knn_graph

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(10):
        for j in range(20):
            v = centers[c] + 0.08 * rng.normal(size=64)
            rows.append((c * 20 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = np.stack([np.asarray(r[1]) for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2)
    exact = {i: set(np.argsort(sims[i])[-5:]) for i in range(0, len(rows), 10)}
    g = knn_graph(df, k=5, iters=4).localCheckpoint(eager=True)
    gadj: dict[int, set] = {}
    for r in g.collect():
        gadj.setdefault(r["src"], set()).add(r["dst"])
    graph_recall = float(
        np.mean([len(gadj.get(i, set()) & exact[i]) / 5 for i in exact])
    )
    queries = df.select("vec_id").filter(df["vec_id"] % 10 == 0)
    got: dict[int, set] = {}
    res = graph_beam_search(g, df, queries, k=5, beam=8, rounds=3)
    for r in res.collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    recall = float(
        np.mean([len(got.get(i, set()) & exact[i]) / 5 for i in exact])
    )
    assert recall >= graph_recall, f"{recall:.3f} < graph {graph_recall:.3f}"
    assert recall >= 0.9, f"clustered search recall@5 = {recall:.3f}"


def test_graph_search_beats_graph_on_unstructured_corpus(spark):
    """The graded embeddings are the curse-of-dimensionality worst
    case (near-uniform 64-d). Measured at sf0.01 (r13): graph
    recall@5 0.21, warm-started beam-48/8-round search 0.71 — the
    expansion more than TRIPLES the graph it navigates. Floors leave
    drift room; a routing/visited-set regression lands far below."""
    import numpy as np

    from stock_data_project_spark.catalog import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2)
    exact = {}
    for qi in ids[ids % llm_next15._QMOD == 0]:
        row = sims[np.where(ids == qi)[0][0]]
        exact[int(qi)] = {int(x) for x in ids[np.argsort(row)[-5:]]}
    got: dict[int, set] = {}
    for r in llm_next15.QUERIES_NEXT["graph_ann_search"](spark, SF_ORACLE).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = float(
        np.mean([len(got.get(q, set()) & exact[q]) / 5 for q in exact])
    )
    assert recall >= 0.5, f"unstructured search recall@5 = {recall:.3f}"


def test_graph_search_shape_invariants(spark):
    from pyspark.sql import functions as F

    df = llm_next15.QUERIES_NEXT["graph_ann_search"](spark, SF_ORACLE)
    row = df.agg(
        F.max("rank").alias("mx"),
        F.sum(
            (F.col("query_id") == F.col("neighbor_id")).cast("int")
        ).alias("self_hits"),
    ).collect()[0]
    assert row["mx"] <= llm_next15._K
    assert row["self_hits"] == 0
    # rank-dense per query, and ranks ordered by sim desc
    bad = (
        df.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("c"), F.max("rank").alias("m"))
        .filter(F.col("c") != F.col("m"))
        .count()
    )
    assert bad == 0


def test_graph_search_runs_with_arrow_disabled(spark):
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = llm_next15.QUERIES_NEXT["graph_ann_search"](
            spark, SF_SMOKE
        ).collect()
        assert len(rows) > 0
        assert isinstance(rows[0]["cosine_sim"], float)
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)
