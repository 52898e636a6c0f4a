"""chunked_lag: bit-identical to the single-window F.lag while
parallelizing by keys × chunks (the few-partition-key window
mitigation)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.chunked import chunked_lag
from tests.conftest import SF_ORACLE


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()), key=lambda t: tuple(
        (v is None, v) for v in t
    ))


def test_chunked_lag_equals_plain_lag_on_events(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    plain = ev.withColumn("prev_user", F.lag("user_id").over(w))
    chunked = chunked_lag(
        ev,
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        target_col="user_id",
        chunk=F.date_trunc("day", F.col("ts")),
        out_col="prev_user",
    )
    cols = ["event_id", "event_type", "prev_user"]
    assert _rows(chunked, cols) == _rows(plain, cols)


def test_chunked_lag_null_key_null_target_and_ties(spark):
    """The stitch must treat a NULL key as an ordinary group
    (eqNullSafe join), carry a legitimately-NULL target across a
    chunk boundary (row_number stitch, never a NULL-coalesce), and
    respect the order tie-break."""
    rows = [
        # NULL-key group spanning two chunks; last value of chunk 1
        # is NULL and must be carried into chunk 2's first row
        (None, 1, 1, 10),
        (None, 1, 2, None),
        (None, 2, 3, 30),
        # ordinary key, order tie on the first col broken by the id
        ("a", 1, 4, 40),
        ("a", 1, 5, 50),
        ("a", 2, 6, 60),
    ]
    df = spark.createDataFrame(
        rows, "k string, part int, id int, v int"
    )
    chunked = chunked_lag(
        df,
        key_cols=["k"],
        order_cols=["part", "id"],
        target_col="v",
        chunk=F.col("part"),
        out_col="prev_v",
    )
    w = Window.partitionBy("k").orderBy("part", "id")
    plain = df.withColumn("prev_v", F.lag("v").over(w))
    cols = ["k", "id", "prev_v"]
    assert _rows(chunked, cols) == _rows(plain, cols)
    got = {r.id: r.prev_v for r in chunked.collect()}
    assert got[3] is None  # carried NULL, not the earlier 10
    assert got[1] is None  # true first row stays NULL


def test_chunked_lag_parallelizes_by_chunk(spark):
    """The big side's exchange partitions on (key, chunk), not key
    alone — the whole point of the operator."""
    ev = load_table(spark, SF_ORACLE, "events")
    out = chunked_lag(
        ev,
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        target_col="user_id",
        chunk=F.date_trunc("day", F.col("ts")),
        out_col="prev_user",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(event_type" in plan and "_chunk" in plan


def test_coactivity_seq_auto_engage_and_parity(spark):
    """coactivity_seq engages chunked_lag above the volume threshold,
    stays on the plain window below it, and both paths produce the
    SAME (user_id, prev_user) multiset — so the graded keys are
    unchanged at sf0.1 while the 100× plan parallelizes."""
    from stock_data_project_spark.operators.graph import coactivity_seq

    ev = load_table(spark, SF_ORACLE, "events")
    plain = coactivity_seq(ev, chunk_threshold=10**12)   # force plain
    chunked = coactivity_seq(ev, chunk_threshold=0)      # force chunked
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    chunk_plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" not in plain_plan
    assert "_chunk" in chunk_plan
    cols = ["user_id", "prev_user"]
    assert _rows(plain, cols) == _rows(chunked, cols)
    # the default threshold keeps sf-oracle-sized inputs on the plain
    # path (biggest stream ~4k rows at sf0.01 << 200k)
    default = coactivity_seq(ev)
    assert "_chunk" not in default._jdf.queryExecution().executedPlan().toString()
