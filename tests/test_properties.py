"""Property-based checks (hypothesis): operator invariants on
generated inputs, compared against pandas reference implementations."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_data_project_spark.operators.asof import asof_join
from stock_data_project_spark.operators.returns import with_cumulative_return, with_daily_return

_prices = st.lists(
    # bounded ratio (10x) keeps the compounding error of 6dp-rounded
    # daily returns well inside the assertion tolerance; unbounded
    # ratios make the worst-case rounding drift exceed it
    st.floats(min_value=10.0, max_value=100.0, allow_nan=False, width=32),
    min_size=2,
    max_size=30,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_prices)
def test_cumulative_return_reconstructs_price(spark, prices):
    """prod(1+r_i) must reconstruct p_n / p_0 (log-sum formulation
    must not drift)."""
    rows = [("k", i, float(round(p, 2))) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, "series_key string, date int, close double")
    out = (
        with_cumulative_return(with_daily_return(df))
        .orderBy("date")
        .collect()
    )
    expect = round(prices[-1] / prices[0] - 1, 2)
    got = out[-1]["cum_return"]
    # daily returns are rounded to 6dp, so allow small compounding slack
    assert abs(got - (round(prices[-1], 2) / round(prices[0], 2) - 1)) < 1e-3 + abs(expect) * 1e-3


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """The union+window as-of join must agree with pandas
    merge_asof(by=key, direction='backward') on arbitrary inputs."""
    left_rows = sorted(set(left_rows))  # unique (key, time) on the left
    left = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in left_rows], "k int, t int, v double"
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right_rows)], "k int, t int, rid int"
    )
    got = (
        asof_join(left, right, "k", "k", "t", "t", ["v"])
        .orderBy("rid")
        .toPandas()[["k", "t", "rid", "v"]]
    )
    lp = pd.DataFrame(left_rows, columns=["k", "t"]).astype("int64")
    lp["v"] = lp["k"] * 1000.0 + lp["t"]
    rp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right_rows)], columns=["k", "t", "rid"]
    ).astype("int64")
    want = pd.merge_asof(
        rp.sort_values("t", kind="stable"),
        lp.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
    ).sort_values("rid")
    pd.testing.assert_series_equal(
        got.set_index(got["rid"].astype("int64"))["v"],
        want.set_index(want["rid"].astype("int64"))["v"],
        check_names=False,
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20),
)
def test_asof_forward_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """direction='forward' (earliest left at/after each right row)
    must agree with pandas merge_asof on arbitrary inputs — the
    mirror-image windowing (right-first at ties, first-following
    state) is easy to get off by one at equal timestamps."""
    left_rows = sorted(set(left_rows))
    left = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in left_rows], "k int, t int, v double"
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right_rows)], "k int, t int, rid int"
    )
    got = (
        asof_join(left, right, "k", "k", "t", "t", ["v"], direction="forward")
        .orderBy("rid")
        .toPandas()[["k", "t", "rid", "v"]]
    )
    lp = pd.DataFrame(left_rows, columns=["k", "t"]).astype("int64")
    lp["v"] = lp["k"] * 1000.0 + lp["t"]
    rp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right_rows)], columns=["k", "t", "rid"]
    ).astype("int64")
    want = pd.merge_asof(
        rp.sort_values("t", kind="stable"),
        lp.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="forward",
    ).sort_values("rid")
    pd.testing.assert_series_equal(
        got.set_index(got["rid"].astype("int64"))["v"],
        want.set_index(want["rid"].astype("int64"))["v"],
        check_names=False,
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),  # key (incl. NULL group)
            st.integers(0, 9),                  # order position
            st.one_of(st.none(), st.integers(0, 50)),  # carried value
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 5),  # chunk width — coarse monotone bucketing
)
def test_chunked_lag_matches_plain_lag(spark, rows, width):
    """chunked_lag == F.lag for ANY key/value/NULL mix and any
    monotone chunking granularity (width 1 = every row its own chunk,
    the maximal-stitch case)."""
    from stock_data_project_spark.operators.chunked import chunked_lag

    data = [(k, pos, i, v) for i, (k, pos, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, pos int, id int, v int")
    from pyspark.sql import Window

    plain = df.withColumn(
        "prev_v", F.lag("v").over(Window.partitionBy("k").orderBy("pos", "id"))
    )
    chunked = chunked_lag(
        df,
        key_cols=["k"],
        order_cols=["pos", "id"],
        target_col="v",
        chunk=F.floor(F.col("pos") / width),
        out_col="prev_v",
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    want = sorted(map(tuple, plain.select("k", "id", "prev_v").collect()), key=key)
    got = sorted(map(tuple, chunked.select("k", "id", "prev_v").collect()), key=key)
    assert got == want
