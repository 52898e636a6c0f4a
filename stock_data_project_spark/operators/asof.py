"""As-of join: attach the most recent left-side state to each right
row (the operator Spark's DataFrame API lacks natively).

Implemented as the scalable union-and-window technique rather than a
per-group ``pd.merge_asof`` UDF: tag both inputs, union, window by
(key, time, tag) and carry the last non-null state forward. One
shuffle on the key, no Python in the hot path, no skew beyond the
key distribution itself — this survives 100 TB where a grouped
pandas UDF would OOM on any hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each right row, the latest left row with
    left_time <= right_time (direction='backward'), or the earliest
    left row with left_time >= right_time (direction='forward'), on
    matching keys — pandas ``merge_asof`` semantics, both inclusive.

    Left must be unique per (key, time) — pre-aggregate if not, or
    the carried value is nondeterministic.
    Output: all right columns + ``asof_<left_time>`` + value_cols.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    lt = F.col(left_time)
    # a NULL-time left row can match nothing in either direction, but
    # if admitted it would SORT somewhere (nulls-first/last) and its
    # non-NULL state struct would be carried into real rows' frames —
    # drop such rows outright
    left = left.filter(lt.isNotNull())
    # the whole left state travels as ONE struct so the carried
    # snapshot is atomic: a left row whose value column is NULL still
    # advances the as-of time and carries its NULL, instead of
    # mixing columns from different left rows (last(...) per column
    # would resurrect an older non-null value)
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        lt.alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            lt.alias(f"asof_{left_time}"), *[F.col(c) for c in value_cols]
        ).alias("_state"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_state"].dataType).alias("_state"),
        F.struct(*right.columns).alias("_r"),
    )
    l_full = l_tagged.withColumn("_r", F.lit(None).cast(r_tagged.schema["_r"].dataType))
    unioned = l_full.unionByName(r_tagged)
    if direction == "backward":
        # left rows sort before right rows at equal time -> <= semantics
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_tag")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = F.last("_state", ignorenulls=True).over(w)
    else:
        # mirror image via a TIME-DESCENDING running frame: scanning
        # from the largest time down, the most recently seen left row
        # is exactly the earliest left with _t >= right _t. Left rows
        # sort before right rows at equal time (tag asc), keeping >=
        # inclusive. A following-frame formulation (first() over
        # [current, unboundedFollowing]) has identical semantics but
        # Spark executes unbounded-following frames by rescanning to
        # the partition end per row — O(n²) on a hot key — while this
        # running frame is the same O(n) shape as the backward path.
        # NULL-time right rows sort last and get their carry masked
        # (no match).
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc_nulls_last(), F.asc("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = F.when(
            F.col("_t").isNotNull(), F.last("_state", ignorenulls=True).over(w)
        )
    carried = unioned.select("_tag", "_r", carry.alias("_state"))
    return carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_r.{c}").alias(c) for c in right.columns],
        F.col(f"_state.asof_{left_time}").alias(f"asof_{left_time}"),
        *[F.col(f"_state.{c}").alias(c) for c in value_cols],
    )
