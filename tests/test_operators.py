"""Operator-level semantic tests on small controlled inputs —
complements the DuckDB parity gate with property checks the oracle
can't express (pandas parity for the reference's metrics, as-of
correctness, dedup invariants)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.operators.asof import asof_join
from stock_data_project_spark.operators.dedup import exact_duplicates, word_shingles
from stock_data_project_spark.operators.returns import (
    with_cumulative_return,
    with_daily_return,
    with_drawdown,
)
from stock_data_project_spark.operators.volatility import with_rolling_volatility


@pytest.fixture(scope="module")
def toy_series(spark):
    rows = []
    for key in ("a", "b"):
        base = 100.0 if key == "a" else 50.0
        for d in range(1, 31):
            rows.append((key, f"2024-01-{d:02d}", base + (d * 7 % 13) - 6 + (0.5 if key == "b" else 0)))
    df = spark.createDataFrame(rows, "series_key string, date string, close double")
    return df.withColumn("date", F.to_date("date"))


def test_daily_return_matches_pandas_pct_change(spark, toy_series):
    """Mirror of the reference's DailyReturn (fetch_stocks.py:213)."""
    got = (
        with_daily_return(toy_series)
        .orderBy("series_key", "date")
        .toPandas()
    )
    pdf = toy_series.orderBy("series_key", "date").toPandas()
    expected = pdf.groupby("series_key")["close"].pct_change().round(6)
    pd.testing.assert_series_equal(
        got["daily_return"], expected, check_names=False
    )


def test_volatility_matches_pandas_rolling_std(spark, toy_series):
    """Mirror of the reference's Volatility (fetch_stocks.py:216)."""
    got = (
        with_rolling_volatility(
            with_daily_return(toy_series), return_col="daily_return", window=20
        )
        .orderBy("series_key", "date")
        .toPandas()
    )
    pdf = toy_series.orderBy("series_key", "date").toPandas()
    ret = pdf.groupby("series_key")["close"].pct_change().round(6)
    pdf["r"] = ret
    expected = (
        pdf.groupby("series_key")["r"].transform(lambda x: x.rolling(window=20).std()).round(6)
    )
    pd.testing.assert_series_equal(got["volatility"], expected, check_names=False)


def test_drawdown_zero_at_new_highs(spark, toy_series):
    from pyspark.sql import Window

    got = with_drawdown(toy_series)
    assert got.filter(F.col("drawdown") > 0).count() == 0
    w = Window.partitionBy("series_key").orderBy("date")
    firsts = got.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assert firsts.filter(F.col("drawdown") != 0).count() == 0


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-05", 20.0), (2, "2024-01-03", 5.0)],
        "k long, t string, v double",
    ).withColumn("t", F.to_date("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-04", "r1"), (1, "2024-01-05", "r2"), (1, "2023-12-31", "r0"),
         (2, "2024-01-10", "r3"), (3, "2024-01-01", "r4")],
        "k long, t string, tag string",
    ).withColumn("t", F.to_date("t"))
    out = asof_join(left, right, "k", "k", "t", "t", ["v"]).orderBy("tag")
    rows = {r["tag"]: (r["asof_t"], r["v"]) for r in out.collect()}
    import datetime

    d = datetime.date
    assert rows["r0"] == (None, None)  # before any left row
    assert rows["r1"] == (d(2024, 1, 1), 10.0)  # latest <= 01-04
    assert rows["r2"] == (d(2024, 1, 5), 20.0)  # equal time counts
    assert rows["r3"] == (d(2024, 1, 3), 5.0)
    assert rows["r4"] == (None, None)  # key never on left
    assert out.count() == 5  # every right row survives


def test_asof_join_carries_null_state_atomically(spark):
    """A left row whose value is NULL must advance the as-of time AND
    carry its NULL — not resurrect an older non-null value."""
    left = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", None)],
        "k long, t string, v double",
    ).withColumn("t", F.to_date("t"))
    right = spark.createDataFrame([(1, "2024-01-03")], "k long, t string").withColumn(
        "t", F.to_date("t")
    )
    row = asof_join(left, right, "k", "k", "t", "t", ["v"]).collect()[0]
    import datetime

    assert row["asof_t"] == datetime.date(2024, 1, 2)
    assert row["v"] is None


def test_cumulative_return_pins_after_wipeout(spark):
    """A -100% day zeroes the position; every later cum_return is -1."""
    df = spark.createDataFrame(
        [("k", 1, 100.0), ("k", 2, 0.0), ("k", 3, 10.0)],
        "series_key string, date int, close double",
    )
    out = {r["date"]: r["cum_return"] for r in
           with_cumulative_return(with_daily_return(df)).collect()}
    assert out[2] == -1.0
    assert out[3] == -1.0


def test_exact_dedup_finds_planted_dups(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other doc"), (4, " HELLO   world ")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df).collect()
    by_keeper = {r["keeper_id"]: r["n_dups"] for r in out}
    assert by_keeper == {1: 3, 3: 1}


def test_exact_dedup_ignores_null_text(spark):
    """NULL-text docs are never grouped as duplicates of each other
    (md5(NULL) would otherwise bucket them all together)."""
    df = spark.createDataFrame(
        [(1, "real doc"), (2, None), (3, None), (4, "real doc")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df).collect()
    by_keeper = {r["keeper_id"]: r["n_dups"] for r in out}
    assert by_keeper == {1: 2}
    assert all(r["content_hash"] is not None for r in out)


def test_drawdown_null_on_zero_peak(spark):
    """A zero running peak yields NULL drawdown, not an ANSI crash."""
    df = spark.createDataFrame(
        [("a", 1, 0.0), ("a", 2, 5.0)], "series_key string, date int, close double"
    )
    rows = {r["date"]: r["drawdown"] for r in with_drawdown(df).collect()}
    assert rows[1] is None
    assert rows[2] == 0.0  # new high


def test_quality_handles_empty_doc(spark):
    """Empty documents score NULL ratios instead of crashing the
    pipeline (ANSI division)."""
    from stock_data_project_spark.operators.textops import with_quality

    df = spark.createDataFrame([(1, ""), (2, "real text here")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in with_quality(df).collect()}
    assert rows[1]["alpha_ratio"] is None
    assert rows[2]["alpha_ratio"] is not None


def test_unit_vector_null_on_zero_vector(spark):
    """All-zero embeddings normalize to NULL elements, not a crash."""
    from stock_data_project_spark.operators.similarity import unit
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [3.0, 4.0])], "id long, v array<double>")
    rows = {r["id"]: r["u"] for r in df.select("id", unit(F2.col("v")).alias("u")).collect()}
    assert rows[1] == [None, None]
    assert rows[2] == [0.6, 0.8]


def test_winnow_whitespace_parity(spark):
    """Python-side normalization must match the SQL oracle on
    tab/newline whitespace (Spark trim strips spaces only)."""
    from stock_data_project_spark.operators.dedup import winnow_fingerprints
    from tests.oracle_utils import compare
    import duckdb

    df = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\ttabbed start and end\t"), (3, "plain middle text")],
        "doc_id long, text string",
    )
    got = winnow_fingerprints(df)
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(1, "hello world\n"), (2, "\ttabbed start and end\t"), (3, "plain middle text")],
    )
    from stock_data_project_spark.plans.llm import ORACLE

    want = con.sql(ORACLE["doc_winnow"]).df()
    compare(got, want)


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "doc_id long, text string")
    got = df.select("doc_id", word_shingles("text", 3).alias("sh")).orderBy("doc_id").collect()
    assert got[0]["sh"] == ["one two"]
    assert got[1]["sh"] == ["a b c", "b c d"]


def test_wilder_rsi_matches_loop_reference(spark, toy_series):
    """with_wilder_rsi (ewm-with-SMA-seed vectorization) must equal
    the textbook scalar recursion avg = (prev*(n-1) + cur) / n."""
    from stock_data_project_spark.operators.volatility import with_wilder_rsi

    window = 14
    got = {
        (r["series_key"], str(r["date"])): r["wilder_rsi"]
        for r in with_wilder_rsi(toy_series, window=window).collect()
    }

    pdf = toy_series.toPandas().sort_values(["series_key", "date"])
    for key, grp in pdf.groupby("series_key"):
        prices = grp["close"].tolist()
        dates = [str(d) for d in grp["date"]]
        n = len(prices)
        deltas = [prices[i + 1] - prices[i] for i in range(n - 1)]
        gains = [max(d, 0.0) for d in deltas]
        losses = [max(-d, 0.0) for d in deltas]
        want: list[float | None] = [None] * n
        if n > window:
            ag = sum(gains[:window]) / window
            al = sum(losses[:window]) / window

            def val(ag: float, al: float) -> float:
                return 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)

            want[window] = val(ag, al)
            for i in range(window + 1, n):
                ag = (ag * (window - 1) + gains[i - 1]) / window
                al = (al * (window - 1) + losses[i - 1]) / window
                want[i] = val(ag, al)
        for d, w in zip(dates, want):
            g = got[(key, d)]
            if w is None:
                assert g is None
            else:
                assert g == pytest.approx(round(w, 6), abs=1e-6)


def test_wilder_rsi_all_gains_is_100(spark):
    from stock_data_project_spark.operators.volatility import with_wilder_rsi

    df = spark.createDataFrame(
        [("up", d, 100.0 + d) for d in range(1, 21)],
        "series_key string, date int, close double",
    )
    rows = {r["date"]: r["wilder_rsi"] for r in with_wilder_rsi(df, window=14).collect()}
    assert rows[10] is None  # window not yet full
    assert rows[15] == 100.0 and rows[20] == 100.0


def test_wilder_rsi_short_series_all_null(spark):
    from stock_data_project_spark.operators.volatility import with_wilder_rsi

    df = spark.createDataFrame(
        [("s", d, 100.0 + (d * 3 % 7)) for d in range(1, 11)],
        "series_key string, date int, close double",
    )
    assert all(
        r["wilder_rsi"] is None for r in with_wilder_rsi(df, window=14).collect()
    )

def test_dim_date_unions_indicator_only_years(spark):
    """An indicator year with NO trading days must still appear in
    DimDate (the reference unions the stock and world-bank calendars,
    fetch_stocks.py:165-184). 2023 has no events below; its year-start
    row comes from the indicator frame — 2023-01-01 was a Sunday."""
    from stock_data_project_spark.operators.star import dim_date

    events = spark.createDataFrame(
        [("2024-01-02 10:00:00",), ("2024-01-03 11:00:00",)], "ts string"
    ).select(F.to_timestamp("ts").alias("ts"))
    indicators = spark.createDataFrame([(2023,), (2024,)], "year int")

    rows = {r["date_key"].strftime("%Y-%m-%d"): r
            for r in dim_date(events, indicator_years=indicators).collect()}
    assert set(rows) == {"2024-01-02", "2024-01-03", "2023-01-01", "2024-01-01"}
    jan1_23 = rows["2023-01-01"]
    assert (jan1_23["year"], jan1_23["month"]) == (2023, 1)
    assert jan1_23["dow"] == 0 and jan1_23["is_weekend"]  # Sunday
    # a year already covered by events dedupes, no duplicate rows
    assert len(rows) == 4

def test_dim_entity_display_name_lookup(spark):
    """The reference's ticker -> display-name CASE mapping
    (fetch_stocks.py:192-197) as a broadcast lookup join; unmapped
    keys keep the upper() fallback."""
    from stock_data_project_spark.operators.star import dim_entity

    events = spark.createDataFrame(
        [("^gspc",), ("^dji",), ("unknown",)], "event_type string"
    )
    name_map = spark.createDataFrame(
        [("^gspc", "S&P 500"), ("^dji", "Dow Jones")],
        "entity_name string, display_name string",
    )
    rows = {r["entity_name"]: r["entity_code"]
            for r in dim_entity(events, name_map=name_map).collect()}
    assert rows == {"^gspc": "S&P 500", "^dji": "Dow Jones", "unknown": "UNKNOWN"}
    # without a map the previous upper() behavior is intact
    plain = {r["entity_name"]: r["entity_code"] for r in dim_entity(events).collect()}
    assert plain["^gspc"] == "^GSPC"


def test_ngram_repetition_planted_loop(spark):
    """A doc that loops one phrase has high dup_fraction; a doc of
    all-distinct 3-grams has exactly 0; short docs (< k words) count
    their single truncated gram once."""
    from stock_data_project_spark.operators.dedup import ngram_repetition

    looping = " ".join(["the cat sat"] * 10)  # 28 grams, 3 distinct
    distinct = "one two three four five six"  # 4 grams, all distinct
    df = spark.createDataFrame(
        [(1, looping), (2, distinct), (3, "hi there"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_repetition(df).collect()}
    assert set(rows) == {1, 2, 3}  # NULL text excluded
    assert rows[2]["dup_fraction"] == 0.0
    assert rows[3]["n_grams"] == 1 and rows[3]["dup_fraction"] == 0.0
    r1 = rows[1]
    assert r1["n_grams"] == 28 and r1["n_distinct_grams"] == 3
    assert r1["dup_fraction"] == round(1.0 - 3 / 28, 6)


def test_gopher_signals_planted_cases(spark):
    """Each Gopher rule fails on a doc built to break exactly it and
    the gate passes on a doc built to satisfy all four."""
    from stock_data_project_spark.operators.textops import with_gopher_signals

    good = "the quick brown fox jumps over a lazy dog and then " * 10  # ~110 words
    too_short = "the quick brown fox and a dog"  # < 50 words
    symbol_heavy = ("the and " + "@@@ ### $$$ " * 30) * 5  # symbols >> 0.1/word
    no_stopwords = "alpha beta gamma delta epsilon zeta " * 20  # 0 distinct stopwords
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbol_heavy), (4, no_stopwords)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_gopher_signals(df).collect()}
    assert rows[1]["passes_gopher"] is True
    assert rows[2]["passes_gopher"] is False and rows[2]["n_words"] < 50
    assert rows[3]["passes_gopher"] is False and rows[3]["symbol_ratio"] > 0.1
    assert rows[4]["passes_gopher"] is False and rows[4]["n_distinct_stopwords"] < 2


def test_asof_null_times_match_nothing(spark):
    """NULL-time left rows must not leak state into the carry (they
    sort somewhere and their struct is non-NULL), and NULL-time right
    rows match nothing — both directions."""
    from stock_data_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, 99.0), (1, 5, 10.0)], "k int, t int, v double"
    )
    right = spark.createDataFrame(
        [(1, 3, 0), (1, 6, 1), (1, None, 2)], "k int, t int, rid int"
    )
    back = {
        r["rid"]: r["v"]
        for r in asof_join(left, right, "k", "k", "t", "t", ["v"]).collect()
    }
    assert back == {0: None, 1: 10.0, 2: None}
    fwd = {
        r["rid"]: r["v"]
        for r in asof_join(
            left, right, "k", "k", "t", "t", ["v"], direction="forward"
        ).collect()
    }
    assert fwd == {0: 10.0, 1: None, 2: None}
