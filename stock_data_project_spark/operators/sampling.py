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


def _unit_hash(id_col: str, seed: int, purpose: str) -> F.Column:
    """Uniform [0,1) from (id, operator purpose, seed). The purpose
    tag decorrelates COMPOSED operators: without it, capping keeps
    exactly the rows with u < rate and a downstream split thresholds
    the SAME u — the upper split bands are then empty by construction
    (observed: cap_per_key → hash_split produced zero val/test rows).
    Each operator draws from its own independent hash stream while
    staying a pure function of (id, seed)."""
    return (
        F.xxhash64(F.col(id_col), F.lit(purpose), F.lit(seed)).cast("double") * _UNIT
        + 0.5
    )


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
    u = _unit_hash(id_col, seed, "split")
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
    u = _unit_hash(id_col, seed, "remix")
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("_dom"))
        .filter(u < F.col("_rate"))
        .drop("_dom", "_rate")
    )


def cap_per_key(
    df: DataFrame,
    n: int,
    key_cols: str | list[str] = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Cap each key's row count at (approximately) ``n``, keeping a
    deterministic hash-uniform sample of the key's rows — the
    "max N documents per domain" gate of a training mix, where a few
    over-crawled domains would otherwise dominate the corpus.

    Default (the 100 TB path): per-key keep RATES. One k-row count
    aggregation derives rate_k = n / n_k, broadcast back, and rows
    keep iff ``xxhash64(id, seed)`` falls under the rate — map-only
    on the data path, no sorts, no per-key state, so a single
    billion-row hot domain costs the same scan as everyone else.
    Kept counts are Binomial(n_k, n/n_k): within O(√n) of the cap,
    never biased. Like ``hash_split``/``remix_corpus``, membership is
    a pure function of (id, seed) — stable across partitioning and
    re-runs.

    ``exact=True``: row_number over (key, hash order) ≤ n — exactly
    min(n, n_k) rows per key, but a hot key's whole group sorts
    inside one task; choose it only when key cardinality ≫ max key
    size (it is also the tie-free ground truth the approximate path
    is tested against).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(
            F.xxhash64(F.col(id_col), F.lit("cap"), F.lit(seed)).asc(),
            F.col(id_col).asc(),
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )
    counts = df.groupBy(*[F.col(k).alias(f"_k_{k}") for k in keys]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    rates = counts.select(
        *[F.col(f"_k_{k}") for k in keys],
        F.least(F.lit(1.0), F.lit(float(n)) / F.col("_n")).alias("_rate"),
    )
    # null-SAFE equality: groupBy puts NULL keys in their own group,
    # so a plain == join would silently drop every NULL-key row while
    # the exact=True path (Window.partitionBy) caps them at n — the
    # two modes must keep the same row sets (ADVICE r3)
    cond = [df[k].eqNullSafe(F.col(f"_k_{k}")) for k in keys]
    u = _unit_hash(id_col, seed, "cap")
    return (
        df.join(F.broadcast(rates), cond)
        .filter(u < F.col("_rate"))
        .drop("_rate", *[f"_k_{k}" for k in keys])
    )
