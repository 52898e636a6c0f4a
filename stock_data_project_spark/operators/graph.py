"""Iterative graph analytics on DataFrames: weighted PageRank.

Second member of the iterative-algorithm family (after
operators/dedup.dedup_clusters' connected components), and subject to
the same two disciplines:

- ``localCheckpoint(eager=True)`` EVERY iteration: a rank frame that
  references its predecessor through a join grows the logical plan
  multiplicatively per round, and Catalyst RE-ANALYSIS (not
  execution) becomes the cost — checkpointing truncates lineage.
  (Cluster note: reliable ``checkpoint()`` if executor loss
  mid-loop must be survivable.)
- per-iteration 6dp rounding: the in-neighbor contribution sum is a
  float reduction whose summation order differs between engines;
  rounding each iteration's output makes every iteration — and
  therefore the fixpoint trajectory — engine-deterministic, which is
  what lets the DuckDB oracle replay the exact trajectory with a
  recursive CTE (same trick as the repo-wide rounding parity rule,
  applied per step instead of once at the end).

Scale shape per iteration: one hash join of the node-sized rank
table against the edge list + one groupBy(dst) — both shuffles on
uniform keys, cost proportional to |E|, no corpus-sized driver
materialization (the only driver value is the node COUNT). 10
iterations of a 100 TB edge list are 10 bounded shuffle rounds —
the same budget the connected-components loop already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_data_project_spark.operators.ckpt import loop_checkpoint

# Above this many rows in the BIGGEST event_type stream, the plain
# per-key window (one sort task per key) loses to the chunked
# split-and-stitch lag, whose parallelism is keys × days. Below it,
# chunked_lag's extra tails pass + stitch join is pure overhead.
# Measured on this host (local[32], r8 A/B, median of 3 warm runs of
# the full edge build):
#   sf0.1   (~20k/key, 5 keys):  plain 0.5s, chunked 0.9s
#   30×     (600k/key, 5 keys):  plain 2.4s, chunked 3.2s
#   120×    (2.4M/key, 5 keys):  plain 8.0s, chunked 11.5s
#   120×/1key (12M in 1 stream): plain 13.3s, chunked 9.6s  ← crossover
# i.e. with keys ≥ cores/6 the overlapped per-key sorts stay ahead
# until a SINGLE stream is many-million rows. On a real cluster the
# crossover sits lower (a sort task is one executor core, and a
# 20 TB stream must spill), so this is the conservative single-box
# number; pass chunk_threshold explicitly for cluster deployments.
COACTIVITY_CHUNK_THRESHOLD = 5_000_000


def coactivity_seq(ev: DataFrame, chunk_threshold: int | None = None) -> DataFrame:
    """(user_id, prev_user) for consecutive events within each
    event_type stream ordered by (ts, event_id) — the shared edge
    construction of user_influence and triangle_count.

    ``F.lag over partitionBy(event_type)`` serializes into one sort
    task per event type (FIVE, on this schema) — correct, and fastest,
    at small per-key volume, but a scale cliff at 100×. This helper
    auto-engages operators/chunked.chunked_lag (bit-identical split-
    and-stitch, parallelism = keys × days) when the largest stream
    exceeds ``chunk_threshold`` rows, measured with one metadata-sized
    groupBy job. Pass an explicit threshold to force either path
    (0 ⇒ always chunked, None ⇒ COACTIVITY_CHUNK_THRESHOLD).
    """
    from stock_data_project_spark.operators.chunked import chunked_lag

    if chunk_threshold is None:
        chunk_threshold = COACTIVITY_CHUNK_THRESHOLD
    biggest = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()["mx"]
        or 0
    )
    if biggest > chunk_threshold:
        return chunked_lag(
            ev.select("event_type", "ts", "event_id", "user_id"),
            key_cols=["event_type"],
            order_cols=["ts", "event_id"],
            target_col="user_id",
            chunk=F.date_trunc("day", F.col("ts")),
            out_col="prev_user",
        ).select("user_id", "prev_user")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select("user_id", F.lag("user_id").over(w).alias("prev_user"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    ``(node, rank)`` for every node that appears as a source.

    Callers must ensure every node has out-degree ≥ 1 (e.g. by
    symmetrizing the graph) — dangling nodes would otherwise leak
    rank mass. rank'(v) = round((1−d)/N + d·Σ_u rank(u)·w(u,v)/W(u) with W = out-weight,
    6dp), iterated ``iters`` times from the uniform vector.

    Preconditions (CHECKED, one metadata-sized job before iterating —
    r6 ADVICE: the self-loop rewrite made these silent): ``src`` must
    be non-NULL (NULL never equi-joins, so a NULL-keyed node would
    vanish from the output instead of holding base rank) and every
    node's total out-weight must be strictly positive and non-NULL
    (W ≤ 0 or a NULL edge weight makes rank·w/W NaN and poisons the
    trajectory). Violations raise ``ValueError`` rather than
    returning a silently narrowed result.
    """
    # e0 has THREE consumers (nodes, outw, e) — lazy localCheckpoint
    # materializes the (possibly expensive) caller edge construction
    # once, at the nodes.count() precondition below, and every later
    # stage re-reads the blocks instead of re-running the subtree
    # (lazy, not persist: blocks release with the RDD, no unpersist
    # bookkeeping; lazy, not eager: no extra materialization job)
    e0 = loop_checkpoint(
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        ),
        eager=False,
    )
    nodes = e0.select(F.col("src").alias("node")).distinct()
    # Zero-weight SELF-LOOP per node: contributes exactly 0 rank mass
    # and 0 out-weight, but guarantees every node appears as a dst —
    # so the per-iteration "left join from the node set to keep
    # zero-IN-degree nodes at base rank" (the r5 review finding)
    # collapses into the contribution groupBy itself. Measured 2.5×
    # at sf0.1 (13.8s → 5.5s over 10 iterations), same trajectory;
    # at scale it removes a node-table shuffle per iteration.
    # NOTE: the contribution stays rank*w/w_out (left-assoc), NOT a
    # precomputed rank*(w/W) ratio — the oracle's recursive CTE
    # evaluates `pr.rank * e.w / o.W`, and the two associations can
    # differ in the last bit exactly at a 6dp rounding boundary (the
    # q9/EMA class).
    loops = nodes.select(
        F.col("node").alias("src"),
        F.col("node").alias("dst"),
        F.lit(0.0).alias("w"),
    )
    outw = e0.groupBy("src").agg(F.sum("w").alias("w_out"))
    # e feeds all `iters` round-joins; lazy checkpoint — computed
    # once inside the single final job, cached, re-read per round
    e = loop_checkpoint(e0.unionByName(loops).join(outw, "src"), eager=False)
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    n_bad = (
        outw.filter(
            F.col("src").isNull()
            | F.col("w_out").isNull()
            | (F.col("w_out") <= 0.0)
        )
        .limit(1)
        .count()
    )
    if n_bad:
        raise ValueError(
            "pagerank: found NULL src and/or a node whose total "
            "out-weight is NULL or <= 0 — NULL keys never "
            "equi-join (the node would silently vanish) and "
            "non-positive W makes rank*w/W NaN; filter NULL "
            "sources and ensure strictly positive edge weights"
        )
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.round(F.lit(1.0 / n), 6))
    # per-round checkpoints stay (the k^rounds plan-growth rule) but
    # go LAZY: the LogicalRDD still truncates the plan at call time,
    # while materialization folds into the one consumer action — one
    # Spark job for the whole trajectory instead of iters+1 eager
    # checkpoint jobs (r13: user_influence 7.4s → 3.3s solo at sf0.1)
    ranks = loop_checkpoint(ranks, eager=False)
    for _ in range(iters):
        ranks = (
            ranks.join(e, ranks.node == e.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("w_out")).alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.round(F.lit(base) + damping * F.col("s"), 6).alias("rank"),
            )
        )
        ranks = loop_checkpoint(ranks, eager=False)
    return ranks
