"""r9-built keys staged for the r11 window (stock_next7
ultimate_oscillator / vortex / ichimoku / heikin_ashi): driver-identical
parity plus per-operator semantic pins."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans import stock_next7
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_stock7_keys_are_oracled():
    assert set(stock_next7.QUERIES_NEXT) == set(stock_next7.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(stock_next7.QUERIES_NEXT))
def test_stock7_parity(spark, key):
    df = stock_next7.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0
    compare(df, duckdb_run(stock_next7.ORACLE_NEXT[key], SF_ORACLE))


def test_ultimate_oscillator_bounded(spark):
    """bp/tr ∈ [0, tr] per row ⇒ every ratio ∈ [0,1] ⇒ UO ∈ [0,100]."""
    import pyspark.sql.functions as F

    df = stock_next7.q_ultimate_oscillator(spark, SF_SMOKE)
    bad = df.filter((F.col("uo") < 0) | (F.col("uo") > 100)).count()
    assert bad == 0


def test_vortex_nonnegative(spark):
    import pyspark.sql.functions as F

    df = stock_next7.q_vortex(spark, SF_SMOKE)
    assert df.filter((F.col("vi_plus") < 0) | (F.col("vi_minus") < 0)).count() == 0


def test_ichimoku_displaced_edges_are_null(spark):
    """senkou A/B are lag(10) → NULL on the first 10 rows per series;
    chikou is lead(10) → NULL on the last 10."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = stock_next7.q_ichimoku(spark, SF_SMOKE)
    w = Window.partitionBy("series_key").orderBy("date")
    wd = Window.partitionBy("series_key").orderBy(F.desc("date"))
    r = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rrn", F.row_number().over(wd))
    )
    assert r.filter((F.col("rn") <= 10) & F.col("senkou_a").isNotNull()).count() == 0
    assert r.filter((F.col("rn") > 10) & F.col("senkou_a").isNull()).count() == 0
    assert r.filter((F.col("rrn") <= 10) & F.col("chikou").isNotNull()).count() == 0


def test_heikin_ashi_flat_series_collapses(spark):
    """On a constant-OHLC series every HA value equals the price: the
    recurrence fixpoint check (also exercises first-row init)."""
    import datetime as dt

    from stock_data_project_spark.plans.stock_next7 import q_heikin_ashi

    rows = [
        ("flat", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(i), 42.5)
        for i in range(12)
    ]
    ev = spark.createDataFrame(
        [(k, t, 42.5, i) for i, (k, t, _, v) in enumerate(rows)],
        "event_type string, ts timestamp, value double, event_id long",
    )
    import pyspark.sql.functions as F

    from stock_data_project_spark.operators.series import daily_bars
    from pyspark.sql import Window

    bars = daily_bars(ev).withColumn(
        "rn", F.row_number().over(Window.partitionBy("series_key").orderBy("date"))
    )
    # drive the fold directly through a monkeypatched _bars_rn
    import stock_data_project_spark.plans.stock_next7 as m

    orig = m._bars_rn
    m._bars_rn = lambda s, d: bars
    try:
        out = q_heikin_ashi(spark, "ignored").collect()
    finally:
        m._bars_rn = orig
    for r in out:
        assert r.ha_open == pytest.approx(42.5)
        assert r.ha_high == pytest.approx(42.5)
        assert r.ha_low == pytest.approx(42.5)
        assert r.ha_close == pytest.approx(42.5)


def test_heikin_ashi_high_low_envelope(spark):
    """ha_high ≥ max(ha_open, ha_close) and ha_low ≤ min(...) by
    construction — the greatest/least layer can't invert."""
    import pyspark.sql.functions as F

    df = stock_next7.q_heikin_ashi(spark, SF_SMOKE)
    bad = df.filter(
        (F.col("ha_high") < F.greatest("ha_open", "ha_close"))
        | (F.col("ha_low") > F.least("ha_open", "ha_close"))
    ).count()
    assert bad == 0
