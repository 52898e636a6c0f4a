"""Range (interval-containment) join: points ⋈ intervals on
start <= t <= end — the second operator Spark's DataFrame API lacks
natively (with as-of; streaming has a watermarked interval join,
batch does not).

A naive ``points.join(intervals, (t >= s) & (t <= e))`` has no
equi-key, so Catalyst falls back to BroadcastNestedLoop — O(|P|·|I|)
compares, a scale killer unless one side is tiny. The scalable shape
is the standard bucketization trick (Spark's own SQL range-join hints
on Databricks, Flink's interval join, and the genomics AIList/bucket
family all use it):

1. pick a bucket width W (≈ the typical interval length);
2. each point maps to ONE bucket floor(t/W); each interval explodes
   to its covered buckets floor(s/W)..floor(e/W);
3. equi-join on the bucket key (hash join — shuffles once per side,
   AQE-skew-handled), then refine with the exact predicate;
4. dedupe is unnecessary BY CONSTRUCTION: a (point, interval) pair
   meets in exactly the point's single bucket.

Cost: |I| · (len/W + 2) exploded interval rows. W far below the
typical interval length inflates the interval side; W far above it
degrades bucket selectivity (many false candidates refined away).
Both degrade gracefully — correctness never depends on W.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width_s: int) -> Column:
    # floor-division of epoch seconds; valid for negative epochs too
    # (floor semantics, not truncation)
    return F.floor(F.unix_timestamp(col) / F.lit(width_s)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 86400,
    how: str = "inner",
    point_id: str | None = None,
    extra_keys: list[tuple[str, str]] | None = None,
    max_buckets: int | None = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_ts <= end_col`` (inclusive both ends).

    Output: all point columns + all interval columns. Column names
    must not collide (select/alias upstream — same contract as a
    plain join). ``how='inner'`` or ``'left'`` (points with no
    covering interval keep NULL interval columns).

    NULL timestamps/bounds never match (SQL comparison semantics),
    and NULL-bounded or REVERSED (end < start — can contain no point)
    intervals explode to nothing rather than everywhere.

    ``max_buckets`` guards the explode against pathological interval
    lengths: an SCD-style 9999-12-31 "forever" sentinel at W=30 min
    would otherwise materialize ~10⁸ sequence elements in one row.
    The guard is IN-PLAN (a conditional raise_error fused into the
    bucket expression — zero extra jobs, laziness preserved) and
    fires at execution time on the first offending row; raise
    ``bucket_width_s`` (or clean the sentinel to NULL and handle
    open intervals separately) when it trips. ``None`` disables it.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    reserved = {"_pb", "_ib"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} are reserved by range_join")

    span = _bucket(F.col(end_col), bucket_width_s) - _bucket(
        F.col(start_col), bucket_width_s
    )
    start_b = _bucket(F.col(start_col), bucket_width_s)
    if max_buckets is not None:
        # fused into the sequence's START argument so column pruning
        # can never drop the check (an eager aggregate here would
        # cost a full interval-side scan per call and break lazy
        # construction — the bench-drift class)
        msg = F.concat(
            F.lit("range_join: interval spans "),
            span.cast("string"),
            F.lit(
                f" buckets at width {bucket_width_s}s "
                f"(max_buckets={max_buckets}); raise bucket_width_s "
                "or clean sentinel end dates"
            ),
        )
        start_b = F.when(
            span > F.lit(max_buckets), F.raise_error(msg).cast("long")
        ).otherwise(start_b)

    p = points.withColumn("_pb", _bucket(F.col(point_ts), bucket_width_s))
    i = intervals.filter(span >= 0).withColumn(
        "_ib",
        F.explode(
            F.sequence(start_b, _bucket(F.col(end_col), bucket_width_s))
        ),
    )
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    cond = (p["_pb"] == i["_ib"]) & exact
    # extra equi-keys (e.g. user == customer in attribution joins)
    # join the hash key alongside the bucket — tighter key, smaller
    # candidate set, same one-shuffle-per-side plan
    for pc, ic in extra_keys or []:
        cond = cond & (p[pc] == i[ic])
    if how == "inner":
        return p.join(i, cond, "inner").drop("_pb", "_ib")
    # left: inner-match via the bucket join, then recover unmatched
    # points with an anti join against the matched set — cheaper than
    # a true left bucket join + post-filter, which would emit every
    # (point, covered-bucket) miss before dropping it. The anti join
    # keys on ``point_id`` when the caller names a unique key, else
    # null-safely on every point column (plain name-list equality
    # would resurrect any matched row carrying a NULL column).
    matched = p.join(i, cond, "inner")
    if point_id is not None:
        unmatched = p.join(
            matched.select(point_id).distinct(), [point_id], "left_anti"
        )
    else:
        m = matched.select(*points.columns).alias("_m")
        pa = p.alias("_p")
        cond = None
        for c in points.columns:
            eq = F.col(f"_p.{c}").eqNullSafe(F.col(f"_m.{c}"))
            cond = eq if cond is None else (cond & eq)
        unmatched = pa.join(m, cond, "left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    unmatched = unmatched.withColumn("_ib", F.lit(None).cast("long"))
    return matched.unionByName(unmatched).drop("_pb", "_ib")
