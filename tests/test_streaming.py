"""Streaming pipeline tests: the incremental star upsert must
converge to exactly the batch daily-bars result (stream/batch
parity), be idempotent across restarts, and merge a (key, day) split
across micro-batches losslessly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.streaming.pipeline import (
    combine_bars,
    mergeable_bars,
    run_incremental_star,
)
from tests.conftest import SF_SMOKE


def _visible(bars_ext):
    return bars_ext.select(
        "series_key", "date", "open", "high", "low", "close", "volume",
        F.round("sum_value", 6).alias("turnover"),
    )


def test_incremental_star_matches_batch(spark):
    with tempfile.TemporaryDirectory() as out:
        run_incremental_star(spark, SF_SMOKE, out)
        got = _visible(spark.read.parquet(f"{out}/fact_bars"))
        want = daily_bars(load_table(spark, SF_SMOKE, "events"))
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # re-run with the same checkpoint: no new data -> unchanged
        run_incremental_star(spark, SF_SMOKE, out)
        again = _visible(spark.read.parquet(f"{out}/fact_bars"))
        assert again.count() == want.count()


def test_partial_batches_merge_losslessly(spark):
    """The bug a replace-by-key upsert has: a day split across two
    micro-batches must still produce the full day's bar."""
    ev = load_table(spark, SF_SMOKE, "events")
    first_half = ev.filter(F.col("event_id") % 2 == 0)
    second_half = ev.filter(F.col("event_id") % 2 == 1)
    merged = combine_bars(
        mergeable_bars(first_half).unionByName(mergeable_bars(second_half))
    )
    want = daily_bars(ev)
    got = _visible(merged)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
