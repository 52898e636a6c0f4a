"""Deterministic corpus sampling: train/val/test splits and
domain re-mixing for training-data pipelines.

Both operators key every keep/route decision off ``xxhash64(id)``
rather than Spark's RNG-based ``randomSplit``/``sample``:

- ``randomSplit`` draws per-partition random numbers, so the SAME
  row can land in a different split when the partitioning changes
  (different cluster size, AQE coalescing, upstream repartition) —
  silent train/test leakage at re-run time. A hash of a stable id is
  a pure function of the data: reproducible on any cluster layout,
  and a late-arriving re-run routes old rows exactly as before.
- The hash is uniform on [0, 2^64), so bucket thresholds give
  fractions accurate to O(1/√n) per stratum with ZERO shuffles —
  sampling at 100 TB stays a map-only scan.

No reference analog (the reference has no sampling stage); this is
the standard training-corpus tooling the brief's LLM-pipeline
section calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; shifting to
# [0, 1) via (h / 2^64 + 0.5) keeps full precision and avoids
# ANSI overflow (no arithmetic on the raw extreme values).
_UNIT = 1.0 / 18446744073709551616.0  # 2^-64


def _unit_hash(id_col: str, seed: int) -> F.Column:
    return F.xxhash64(F.col(id_col), F.lit(seed)).cast("double") * _UNIT + 0.5


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col`` assigning each row to one named split with
    probability proportional to its weight — deterministically, from
    ``xxhash64(id, seed)`` alone.

    Unlike ``DataFrame.randomSplit`` the assignment is a pure
    function of (id, seed): stable across partitioning, cluster
    size, and re-runs, so train/test membership can never drift
    between pipeline executions. Zero shuffles; a different ``seed``
    re-draws the whole assignment.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = _unit_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, name)
        expr = branch if expr is None else expr.when(u < acc, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def remix_corpus(
    df: DataFrame,
    target_fractions: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Down-sample domains to hit a target mixture (the training-data
    "data mixing" step: cap over-represented sources so the corpus
    matches a prescribed domain distribution).

    For each domain d with target fraction t_d, the kept count is
    s · t_d where s = min over domains of (n_d / t_d) — the largest
    corpus achievable WITHOUT up-sampling any domain (domains absent
    from ``target_fractions`` are dropped). Per-row keep decisions
    are ``xxhash64(id, seed) < rate_d``: deterministic, map-only.

    Plan shape: one groupBy(domain) count (k rows), the per-domain
    rates derived relationally (no ``.collect()``), broadcast back,
    one filtered scan. At 100 TB the only shuffle is the k-row count.
    """
    if not target_fractions:
        raise ValueError("target_fractions must be non-empty")
    t = float(sum(target_fractions.values()))
    targets_df = df.sparkSession.createDataFrame(
        [(d, f / t) for d, f in target_fractions.items()], ["_dom", "_tfrac"]
    )
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # s = min(n_d / t_d); rate_d = s * t_d / n_d  (<= 1 by construction)
    scaled = counts.join(targets_df, "_dom").withColumn(
        "_scale", F.col("_n") / F.col("_tfrac")
    )
    s_min = scaled.agg(F.min("_scale").alias("_s"))
    rates = scaled.crossJoin(F.broadcast(s_min)).select(
        "_dom", (F.col("_s") * F.col("_tfrac") / F.col("_n")).alias("_rate")
    )
    u = _unit_hash(id_col, seed)
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("_dom"))
        .filter(u < F.col("_rate"))
        .drop("_dom", "_rate")
    )
