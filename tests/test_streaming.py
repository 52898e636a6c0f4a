"""Streaming pipeline tests: the incremental star upsert must
converge to exactly the batch daily-bars result (stream/batch
parity), and be idempotent across restarts."""

from __future__ import annotations

import tempfile

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.series import daily_bars
from stock_data_project_spark.streaming.pipeline import run_incremental_star
from tests.conftest import SF_SMOKE


def test_incremental_star_matches_batch(spark):
    with tempfile.TemporaryDirectory() as out:
        run_incremental_star(spark, SF_SMOKE, out)
        got = spark.read.parquet(f"{out}/fact_bars")
        want = daily_bars(load_table(spark, SF_SMOKE, "events"))
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # re-run with the same checkpoint: no new data -> unchanged
        run_incremental_star(spark, SF_SMOKE, out)
        again = spark.read.parquet(f"{out}/fact_bars")
        assert again.count() == want.count()
