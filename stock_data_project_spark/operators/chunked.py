"""Range-chunked window primitives: per-key sequence operators whose
parallelism does NOT collapse to one task per partition key.

``Window.partitionBy(k).orderBy(o)`` executes as ONE sort task per
distinct ``k`` — fine when keys are plentiful, a scale hazard when
they are few (the events table has FIVE event types: a per-type lag
over 20 TB/type would be five giant sort tasks). ``chunked_lag``
restores parallelism with the split-and-stitch decomposition the
repo already uses for SCD2 runs (operators/scd2.merge_runs):

1. lag WITHIN (key, chunk) — chunk is a caller-supplied bucket that
   is a MONOTONE function of the leading order column (e.g.
   ``date_trunc('day', ts)`` for ``orderBy(ts, ...)``), so sorting by
   (chunk, order) equals sorting by (order) and every chunk boundary
   is a clean sequence cut. Parallelism = keys × chunks.
2. per-(key, chunk) TAILS — the last row's carried value, a
   metadata-sized table (keys × chunks rows).
3. stitch: each chunk's FIRST row (row_number == 1, not a NULL test
   — the carried value may legitimately be NULL) takes the previous
   chunk's tail via a lag over the tails table, broadcast-joined
   back. The first chunk of a key stays NULL, exactly like plain
   ``F.lag``.

The result is bit-identical to the single-window lag (it is exact
sequence algebra, no floats), pinned by tests/test_chunked.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_lag(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    target_col: str,
    chunk: Column,
    out_col: str,
) -> DataFrame:
    """``F.lag(target_col) over (partition by key order by order)``
    computed with keys × chunks parallelism. ``chunk`` MUST be
    non-decreasing in the leading order column within every key
    (caller contract — e.g. a date_trunc of a timestamp order col);
    a violation reorders rows across chunk boundaries and the stitch
    silently computes a different sequence.
    """
    d = df.withColumn("_chunk", chunk)
    wloc = Window.partitionBy(*key_cols, "_chunk").orderBy(*order_cols)
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    local = d.withColumn("_lag_loc", F.lag(target_col).over(wloc)).withColumn(
        "_rn", F.row_number().over(wloc)
    )
    tails = d.groupBy(*key_cols, "_chunk").agg(
        F.max_by(target_col, ord_struct).alias("_tail")
    )
    wchunk = Window.partitionBy(*key_cols).orderBy("_chunk")
    prev_tails = tails.withColumn(
        "_prev_tail", F.lag("_tail").over(wchunk)
    ).select(
        *[F.col(c).alias(f"_pt_{c}") for c in key_cols],
        F.col("_chunk").alias("_pt_chunk"),
        "_prev_tail",
    )
    # metadata-sized (keys × chunks): broadcast the stitch table so
    # the big side keeps its (key, chunk) distribution un-reshuffled.
    # eqNullSafe: plain F.lag treats a NULL key (or the NULL-order
    # chunk) as an ordinary group — the stitch join must too.
    cond = local["_chunk"].eqNullSafe(F.col("_pt_chunk"))
    for c in key_cols:
        cond = cond & local[c].eqNullSafe(F.col(f"_pt_{c}"))
    stitched = local.join(F.broadcast(prev_tails), cond, "left").withColumn(
        out_col,
        F.when(F.col("_rn") == 1, F.col("_prev_tail")).otherwise(
            F.col("_lag_loc")
        ),
    )
    return stitched.drop(
        "_chunk",
        "_lag_loc",
        "_rn",
        "_prev_tail",
        "_pt_chunk",
        *[f"_pt_{c}" for c in key_cols],
    )
