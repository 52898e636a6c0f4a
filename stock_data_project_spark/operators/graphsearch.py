"""Graph-ANN SEARCH: batched best-first (beam) search over a kNN
graph — the query-time half of the graph-ANN capability whose offline
half is ``operators/nndescent.knn_graph`` (the r12 verdict's one
named LLM-family gap: "only the kNN-graph BUILD exists; the
graph-SEARCH layer is not yet a key").

The sequential algorithm (DiskANN/Vamana's GreedySearch, HNSW's
layer-0 search) keeps a priority queue per query and expands one
node at a time. The data-parallel re-expression expands the WHOLE
beam each round — the standard batched relaxation of best-first
search (one frontier join per round instead of |beam|·rounds
sequential steps), which preserves the invariant that matters for
quality (the beam always holds the best B scored nodes) while making
every step a uniform hash join:

  scored_0 = { (q, entry) } ∪ { (q, w) : (q, w) ∈ graph }
  round t:  frontier = beam_{t-1} (top-B of scored_{t-1})
            nbrs     = frontier ⋈ graph  (hash join on node id)
            new      = nbrs ∖ scored_{t-1} (anti-join — each (q, node)
                        pair is scored AT MOST ONCE, like the visited
                        set of the sequential algorithm)
            scored_t = scored_{t-1} ∪ score(new)
  answer:   per-query top-k of scored_R, self-match excluded

The warm start (seeding scored_0 with the query's OWN adjacency when
the query is an in-corpus vector) is the DiskANN-style refinement
search: it guarantees search recall ≥ graph recall by construction —
the final top-k ranks over a superset of the query's graph edges —
and it is what makes the search correct on clustered corpora whose
kNN graph is DISCONNECTED (tight clusters keep all k edges
in-cluster; a single global entry could never cross components, the
exact failure Vamana's long-range α-pruned edges and HNSW's upper
layers exist to prevent). Out-of-corpus queries have no adjacency
row and fall back to entry-only seeding — the honest limitation of a
graph with no long-range edges.

Everything is deterministic and engine-replayable (same recipe as
the graph build): cosine rounded to 6dp BEFORE ranking (np unit-row
dot — ``pair_cosine``), ties break by ascending node id, the entry
point is min(id) (the deterministic stand-in for DiskANN's medoid),
degenerate (zero-norm/NULL) vectors score NULL and never enter the
beam. The self-pair (q, q) IS scored and MAY sit in the beam — its
expansion seeds the search with q's own graph neighbors, exactly
what a medoid-entry search wants — but is excluded from the final
top-k (a query is not its own neighbor).

Scale shape: per round the frontier join produces ≤ |Q|·B·k rows,
the anti-join keys are uniform (query, node) pairs, and the scoring
kernel is the same Arrow row-wise dot as the build — no corpus GEMM,
no n² anywhere; |Q| queries cost |Q|·B·k·R pair scores total. The
accumulated scored set is localCheckpoint-truncated each round
(it feeds both the anti-join and the union — the iterative
plan-growth rule, dedup_clusters class; reliable checkpoint() on a
cluster if executor loss mid-loop matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_data_project_spark.operators.ckpt import loop_checkpoint
from stock_data_project_spark.operators.nndescent import pair_cosine


def graph_beam_search(
    graph: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 8,
    rounds: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query top-k (query_id, node id, sim) found by batched
    best-first search over ``graph`` (rows (src, dst), typically the
    ``knn_graph`` output). ``queries`` is a one-column frame of query
    ids drawn from ``vectors``; the search never scans the corpus —
    only graph-adjacent candidates are ever scored."""
    if beam <= k:
        # the beam-equals-answer reduction below needs B ≥ k+1 (see
        # the final-top-k note); smaller beams would change semantics
        raise ValueError("beam must exceed k")
    entry = vectors.agg(F.min(id_col).alias("_eid"))
    adj = graph.select("src", "dst")
    q = queries.select(F.col(id_col).alias("qid"))
    # Every query-side frame in this search is bounded by the query
    # panel (|Q|·B·k rows at ANY corpus size), while adj and vectors
    # are corpus-sized — so each join below broadcasts the query side
    # explicitly (guide §3.1: post-checkpoint size estimates are
    # useless, so the planner would otherwise shuffle BOTH sides; the
    # hints leave the corpus un-shuffled, one streamed scan per join).
    seed = (
        q.crossJoin(F.broadcast(entry))
        .select("qid", F.col("_eid").alias("id"))
        .unionByName(
            F.broadcast(q).join(adj, q["qid"] == adj["src"]).select(
                "qid", F.col("dst").alias("id")
            )
        )
        .distinct()
    )
    # STATE SLIMMING (r13 ladder fix, measured 2.7×/doubling before):
    # top-B(scored_t) == top-B(top-B(scored_{t-1}) ∪ new_t) — a row of
    # the superset's top-B that lies in scored_{t-1} is a fortiori in
    # the subset's top-B — so the full accumulated scored set never
    # needs to be kept WITH sims. Carry only:
    #   beam_sc: the per-query top-B (with sims) — the running answer
    #   visited: the (qid, id) pairs ever scored (sans sims) — the
    #            at-most-once-scoring anti-join set
    # The per-round window then runs over |Q|·(B + B·k) rows instead
    # of the whole history, and the checkpointed state shrinks ~6×.
    # ONE eager checkpoint per round (the beam) instead of three: the
    # beam job already materializes that round's `new` (scored_new
    # feeds the beam), so `new` and the visited union go LAZY — the
    # LogicalRDD still truncates the plan at call time (the k^rounds
    # rule) while their blocks are written as a side effect of the
    # beam job and re-read by the next round's anti-join; the visited
    # union itself is a narrow op over cached blocks. All-lazy was
    # measured SLOWER (8.9s → 11.1s solo at sf0.1): with no action
    # per round the final job runs independent stages over the same
    # un-materialized checkpoint concurrently and duplicates their
    # whole subtrees. 3 eager → 1 eager measured 8.9s → 4.5s.
    beam_sc = loop_checkpoint(
        _topn(
            pair_cosine(
                seed, vectors, id_col=id_col, vec_col=vec_col,
                src_col="qid", dst_col="id", broadcast_pairs=True,
            ),
            beam,
        ),
        eager=True,
    )
    visited = loop_checkpoint(seed, eager=False)
    for _ in range(rounds):
        nbrs = (
            F.broadcast(beam_sc).join(adj, beam_sc["id"] == adj["src"])
            .select("qid", F.col("dst").alias("id"))
            .distinct()
        )
        # anti-join against the (query-bounded) visited set: broadcast
        # the RIGHT side — BroadcastHashJoin LeftAnti, no exchange
        new = loop_checkpoint(
            nbrs.join(F.broadcast(visited), ["qid", "id"], "left_anti"),
            eager=False,
        )
        scored_new = pair_cosine(
            new, vectors, id_col=id_col, vec_col=vec_col,
            src_col="qid", dst_col="id", broadcast_pairs=True,
        )
        beam_sc = loop_checkpoint(
            _topn(
                beam_sc.select("qid", "id", "sim").unionByName(scored_new),
                beam,
            ),
            eager=True,
        )
        # plain union, no checkpoint: the chain is a FLAT union of
        # already-checkpointed LogicalRDDs (linear plan growth, not
        # k^rounds), and each round's anti-join reads the cached
        # blocks narrowly — re-storing the growing set every round
        # would cost O(rounds²) block writes for nothing
        visited = visited.unionByName(new)
    # final top-k == top-k of the final beam minus self: with B ≥ k+1,
    # any row among the top-k of (scored ∖ self) has at most k rows of
    # scored above it, so it sits in the top-(k+1) ⊆ beam
    w = Window.partitionBy("qid").orderBy(F.desc_nulls_last("sim"), F.asc("id"))
    return (
        beam_sc.filter(F.col("qid") != F.col("id"))
        .withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") <= k) & F.col("sim").isNotNull())
        .select("qid", "id", "sim", F.col("_r").cast("int").alias("rank"))
    )


def _topn(scored: DataFrame, n: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc_nulls_last("sim"), F.asc("id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") <= n) & F.col("sim").isNotNull())
        .drop("_r")
    )
