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


# ------------------------------------------------------------- llm_next9

from stock_data_project_spark.plans import llm_next9  # noqa: E402


def test_llm9_keys_are_oracled():
    assert set(llm_next9.QUERIES_NEXT) == set(llm_next9.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(llm_next9.QUERIES_NEXT))
def test_llm9_parity(spark, key):
    df = llm_next9.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0
    compare(df, duckdb_run(llm_next9.ORACLE_NEXT[key], SF_ORACLE))


def test_kmeans_partitions_all_vectors(spark):
    """Cluster sizes sum to the corpus size and every cluster is
    keyed 0..k-1 (init ids exist, so no cluster can vanish — empty
    clusters keep their centroid but sizes come from assignment)."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.catalog import load_table

    out = llm_next9.q_embedding_kmeans(spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_members for r in out) == n
    assert {r.cluster for r in out} <= set(range(llm_next9._K))
    for r in out:
        assert r.inertia >= 0 and r.avg_dist >= 0


def test_kmeans_rounds_do_not_increase_inertia(spark):
    """Lloyd's algorithm monotonically decreases total inertia —
    verified on the EXACT decimal trajectory by re-running with
    R=1..3 (the rounding perturbs each step but assignment is argmin
    vs the centroids that produced it, so the classic proof holds
    between round r's distances and round r+1's)."""
    import stock_data_project_spark.plans.llm_next9 as m

    totals = []
    orig = m._ROUNDS
    try:
        for rounds in (1, 2, 3):
            m._ROUNDS = rounds
            out = m.q_embedding_kmeans(spark, SF_SMOKE).collect()
            totals.append(sum(float(r.inertia) for r in out))
    finally:
        m._ROUNDS = orig
    assert totals[0] >= totals[1] - 1e-6
    assert totals[1] >= totals[2] - 1e-6


def test_quality_classifier_weights_cover_both_signs(spark):
    """The deterministic weight table must yield both keep=1 and
    keep=0 docs (a degenerate all-one-sign scorer would grade but
    test nothing)."""
    import pyspark.sql.functions as F

    df = llm_next9.q_quality_classifier(spark, SF_SMOKE)
    keeps = {r.keep for r in df.select("keep").distinct().collect()}
    assert keeps == {0, 1}


def test_quality_classifier_token_counts_match_token_count_key(spark):
    """n_tokens agrees with the documents' whitespace tokenization
    (same normalized() path as token_count)."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.textops import words

    docs = load_table(spark, SF_SMOKE, "documents")
    want = (
        docs.select(
            "doc_id",
            F.size(F.filter(words("text"), lambda w: w != "")).alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    got = llm_next9.q_quality_classifier(spark, SF_SMOKE).select(
        "doc_id", "n_tokens"
    )
    diff = got.join(want, "doc_id").filter(F.col("n_tokens") != F.col("n")).count()
    assert diff == 0
    assert got.count() == want.count()


# ------------------------------------------------------------ olap_next9

from stock_data_project_spark.plans import olap_next9  # noqa: E402


def test_olap9_keys_are_oracled():
    assert set(olap_next9.QUERIES_NEXT) == set(olap_next9.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(olap_next9.QUERIES_NEXT))
def test_olap9_parity(spark, key):
    df = olap_next9.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0
    compare(df, duckdb_run(olap_next9.ORACLE_NEXT[key], SF_ORACLE))


def _simulate_kcore(edges, k, rounds):
    import collections

    E = set(edges)
    for _ in range(rounds):
        deg = collections.Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, c in deg.items() if c >= k}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            break
        E = E2
    deg = collections.Counter()
    for a, b in E:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_kcore_matches_python_simulation(spark, sf):
    """The graded R-round peel equals an independent in-memory
    simulation — robust to testdata regeneration (no fixpoint claim
    needed; both bound at R identically)."""
    edges = [
        (r.a, r.b)
        for r in olap_next9._copurchase_edges(spark, sf).select("a", "b").collect()
    ]
    want = _simulate_kcore(edges, olap_next9._K, olap_next9._ROUNDS)
    got = {
        r.node: r.degree
        for r in olap_next9.q_kcore_decomposition(spark, sf).collect()
    }
    assert got == want


def test_kcore_peels_crafted_chain_off_clique(spark):
    """A 4-clique with a pendant chain: the 2-core is exactly the
    clique (chain peels one node per round — exercises multi-round
    convergence and the early-exit)."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "a long, b long")
    import stock_data_project_spark.plans.olap_next9 as m

    orig = m._copurchase_edges
    m._copurchase_edges = lambda s, d: edges.withColumn(
        "support", edges.a * 0 + 2
    )
    try:
        got = {r.node: r.degree for r in m.q_kcore_decomposition(spark, "x").collect()}
    finally:
        m._copurchase_edges = orig
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_item_similarity_bounds_and_symmetric_df(spark):
    """jaccard in (0, 1]; support <= min(df_a, df_b)."""
    import pyspark.sql.functions as F

    df = olap_next9.q_item_similarity(spark, SF_SMOKE)
    assert df.filter((F.col("jaccard") <= 0) | (F.col("jaccard") > 1)).count() == 0
    assert df.filter(
        F.col("support") > F.least("df_a", "df_b")
    ).count() == 0


# ----------------------------------------------------------- stream_next8

from stock_data_project_spark.plans import stream_next8  # noqa: E402


def test_stream8_key_is_oracled():
    assert set(stream_next8.QUERIES_NEXT) == set(stream_next8.ORACLE_NEXT)


def test_stream_left_join_parity(spark):
    df = stream_next8.stream_left_join(spark, SF_ORACLE)
    assert_gradable_schema(df, "stream_left_join")
    assert df.count() > 0
    compare(df, duckdb_run(stream_next8.ORACLE_NEXT["stream_left_join"], SF_ORACLE))


def test_stream_left_join_null_rows_respect_horizon(spark):
    """Every null-extended view sits strictly below the final
    watermark horizon; every unmatched view above it is withheld —
    and no view's expiry TIES the ms-truncated watermark (the
    measure-zero assumption the strict-< oracle relies on)."""
    import duckdb

    import pyspark.sql.functions as F

    for sf in (SF_SMOKE, SF_ORACLE):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        (n_ties,) = con.sql(
            f"""
            WITH fwm AS (
                SELECT least(
                    (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                     WHERE event_type = 'view'),
                    (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                     WHERE event_type = 'click')
                ) - CAST({stream_next8._SLJ_DELAY_US} AS BIGINT) AS wm
            )
            SELECT count(*) FROM events, fwm
            WHERE event_type = 'view'
              AND epoch_us(ts) + {stream_next8._SLJ_INTERVAL_US} = fwm.wm
            """
        ).fetchone()
        assert n_ties == 0, (sf, n_ties)

    out = stream_next8.stream_left_join(spark, SF_SMOKE)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    (wm_us,) = con.sql(
        f"""SELECT least(
            (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
             WHERE event_type = 'view'),
            (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
             WHERE event_type = 'click')
        ) - CAST({stream_next8._SLJ_DELAY_US} AS BIGINT)"""
    ).fetchone()
    nulls = out.filter(F.col("click_id").isNull())
    above = nulls.filter(
        F.unix_micros("view_ts") + stream_next8._SLJ_INTERVAL_US >= wm_us
    ).count()
    assert above == 0


# -------------------------------------------------------- parabolic_sar


def test_parabolic_sar_parity(spark):
    df = stock_next7.q_parabolic_sar(spark, SF_ORACLE)
    assert_gradable_schema(df, "parabolic_sar")
    assert df.count() > 0
    compare(df, duckdb_run(stock_next7.ORACLE_NEXT["parabolic_sar"], SF_ORACLE))


def test_parabolic_sar_exercises_reversals(spark):
    """Both flip directions must occur on the graded data — a
    flip-free series would leave the reversal branches untested."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = stock_next7.q_parabolic_sar(spark, SF_ORACLE)
    w = Window.partitionBy("series_key").orderBy("date")
    flips = df.withColumn("pt", F.lag("trend").over(w)).filter(
        F.col("pt").isNotNull() & (F.col("pt") != F.col("trend"))
    )
    dirs = {r.trend for r in flips.select("trend").distinct().collect()}
    assert dirs == {1, -1}


def test_parabolic_sar_flat_series_never_reverses(spark):
    """Constant bars: trend stays up (close2 >= close1), sar pins to
    the price, af never bumps — the recurrence fixpoint."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from stock_data_project_spark.operators.series import daily_bars

    ev = spark.createDataFrame(
        [
            ("flat", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 7.25, i)
            for i in range(10)
        ],
        "event_type string, ts timestamp, value double, event_id long",
    )
    bars = daily_bars(ev).withColumn(
        "rn", F.row_number().over(Window.partitionBy("series_key").orderBy("date"))
    )
    import stock_data_project_spark.plans.stock_next7 as m

    orig = m._bars_rn
    m._bars_rn = lambda s, d: bars
    try:
        out = m.q_parabolic_sar(spark, "ignored").collect()
    finally:
        m._bars_rn = orig
    assert len(out) == 9
    for r in out:
        assert r.trend == 1
        assert r.psar == pytest.approx(7.25)


def test_parabolic_sar_stays_outside_price_range(spark):
    """Invariant: in an uptrend the SAR sits at/below the bar's low
    region only after clamping — concretely, sar <= high always and
    a reversal bar resets sar to the finished trend's extreme, which
    bounds sar within the series' [min low, max high]."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.plans.stock_next4 import _bars_rn

    bars = _bars_rn(spark, SF_SMOKE).groupBy("series_key").agg(
        F.min("low").alias("lo"), F.max("high").alias("hi")
    )
    df = stock_next7.q_parabolic_sar(spark, SF_SMOKE).join(bars, "series_key")
    bad = df.filter(
        (F.col("psar") < F.col("lo")) | (F.col("psar") > F.col("hi"))
    ).count()
    assert bad == 0


# ---------------------------------- embedding_outliers / source_mix_report


@pytest.mark.parametrize("key", ["embedding_outliers", "source_mix_report"])
def test_llm9b_parity(spark, key):
    df = llm_next9.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0
    compare(df, duckdb_run(llm_next9.ORACLE_NEXT[key], SF_ORACLE))


def test_outliers_are_the_far_tail(spark):
    """Every flagged vector's dist strictly exceeds its cluster mean
    (by the 1.05 factor), and the flagged set is a minority."""
    import pyspark.sql.functions as F

    out = llm_next9.q_embedding_outliers(spark, SF_SMOKE)
    n_out = out.count()
    assert 0 < n_out
    from stock_data_project_spark.catalog import load_table

    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert n_out < 0.25 * n
    bad = out.filter(F.col("dist") <= F.col("cluster_mean_dist")).count()
    assert bad == 0


def test_source_mix_shares_sum_to_one(spark):
    """Token shares are exact-integer roundings of n_tokens/total —
    their sum is 1 ± 20·5e-7 (one rounding step per source)."""
    import pyspark.sql.functions as F

    df = llm_next9.q_source_mix_report(spark, SF_SMOKE)
    total_share = df.agg(F.sum("token_share")).collect()[0][0]
    n_src = df.count()
    assert abs(total_share - 1.0) <= n_src * 5e-7
    tok = df.agg(F.sum("n_tokens")).collect()[0][0]
    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.textops import words

    docs = load_table(spark, SF_SMOKE, "documents")
    want = docs.select(F.explode(words("text")).alias("w")).filter(
        F.col("w") != ""
    ).count()
    assert tok == want


# ---------------------------------------------------------- retrieval_ndcg


def test_retrieval_ndcg_parity(spark):
    df = llm_next9.QUERIES_NEXT["retrieval_ndcg"](spark, SF_ORACLE)
    assert_gradable_schema(df, "retrieval_ndcg")
    assert df.count() > 0
    compare(df, duckdb_run(llm_next9.ORACLE_NEXT["retrieval_ndcg"], SF_ORACLE))


def test_ndcg_bounds_and_weights(spark):
    """ndcg in [0,1]; dcg <= ideal prefix sum; a perfect single-rank
    hit at rank 1 with n_relevant >= 5 gives ndcg = round(1/cum5, 6)
    — checked arithmetically against the pinned literals."""
    import pyspark.sql.functions as F

    df = llm_next9.q_retrieval_ndcg(spark, SF_SMOKE)
    assert df.filter((F.col("ndcg") < 0) | (F.col("ndcg") > 1)).count() == 0
    # weights are the canonical 1/log2(rank+1) to 6dp
    import math

    assert llm_next9._NDCG_W[0] == 1.0
    for i, w in enumerate(llm_next9._NDCG_W):
        assert w == pytest.approx(1.0 / math.log2(i + 2), abs=5e-7)
    # cumulative literals are exact decimal prefix sums
    from decimal import Decimal

    acc = Decimal(0)
    for w, c in zip(llm_next9._NDCG_W, llm_next9._NDCG_CUMW):
        acc += Decimal(str(w))
        assert Decimal(c) == acc


def test_ndcg_relevance_is_language_match(spark):
    """Recompute one query's DCG by hand from the retrieval output
    and the documents table."""
    from decimal import Decimal

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.plans.llm_next6 import q_tfidf_retrieval

    ret = q_tfidf_retrieval(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    out = {r.query_id: r for r in llm_next9.q_retrieval_ndcg(spark, SF_SMOKE).collect()}
    qid = next(iter(out))
    dcg = Decimal(0)
    for r in ret:
        if r.query_id == qid and docs[r.doc_id] == docs[qid]:
            dcg += Decimal(str(llm_next9._NDCG_W[r.rank - 1]))
    assert float(dcg) == pytest.approx(out[qid].dcg, abs=1e-9)


# ------------------------------------------------------------ olap_next10

from stock_data_project_spark.plans import olap_next10  # noqa: E402


def test_olap10_keys_are_oracled():
    assert set(olap_next10.QUERIES_NEXT) == set(olap_next10.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(olap_next10.QUERIES_NEXT))
def test_olap10_parity(spark, key):
    df = olap_next10.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0
    compare(df, duckdb_run(olap_next10.ORACLE_NEXT[key], SF_ORACLE))


def test_ks_matches_scipy_style_reference(spark):
    """Independent in-memory KS over the same cents samples."""
    row = olap_next10.q_ks_statistic(spark, SF_SMOKE).collect()[0]
    a = sorted(
        r.cents
        for r in olap_next10._seg_cents(
            spark, SF_SMOKE, olap_next10._KS_SEG_A
        ).collect()
    )
    b = sorted(
        r.cents
        for r in olap_next10._seg_cents(
            spark, SF_SMOKE, olap_next10._KS_SEG_B
        ).collect()
    )
    n, m = len(a), len(b)
    assert (row.n, row.m) == (n, m)
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a, v) * m - bisect.bisect_right(b, v) * n)
        for v in set(a) | set(b)
    )
    assert row.d_num == d_num
    assert 0 <= row.ks <= 1


def test_gini_bounds_and_uniform_zero(spark):
    """G in [0, 1); a crafted equal-revenue segment ginis to ~0
    ((n-1)-free exactness: 2Σi·x = (n+1)Σx when all x equal)."""
    import pyspark.sql.functions as F

    df = olap_next10.q_gini_coefficient(spark, SF_SMOKE)
    assert df.filter((F.col("gini") < 0) | (F.col("gini") >= 1)).count() == 0
    # exactness pin: equal values -> numerator exactly 0
    n, x = 7, 12345
    a = 2 * sum(i * x for i in range(1, n + 1)) - (n + 1) * n * x
    assert a == 0


def test_benford_shares_and_digits(spark):
    import pyspark.sql.functions as F

    df = olap_next10.q_benford_deviation(spark, SF_SMOKE)
    rows = df.collect()
    assert all(1 <= r.digit <= 9 for r in rows)
    total_share = sum(r.obs_share for r in rows)
    assert abs(total_share - 1.0) <= 9 * 5e-7
    # pinned literals are the canonical log10(1 + 1/d)
    import math

    for d, w in olap_next10._BENFORD_EXP.items():
        assert w == pytest.approx(math.log10(1 + 1 / d), abs=5e-7)


def test_chi2_cells_reconstruct_totals(spark):
    """Observed cell counts sum to the corpus size; every expected
    value is positive; chi2 >= 0."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.catalog import load_table

    df = olap_next10.q_categorical_association(spark, SF_SMOKE)
    n = load_table(spark, SF_SMOKE, "documents").count()
    agg = df.agg(
        F.sum("observed").alias("tot"),
        F.min("expected").alias("emin"),
        F.min("chi2_cell").alias("cmin"),
    ).collect()[0]
    assert agg.tot == n
    assert agg.emin > 0
    assert agg.cmin >= 0


def test_parity_sf_dirs_stay_on_exact_pair_path(spark):
    """ADVICE r11: theil_sen_slope / kendall_tau oracle parity depends
    on every series in graded/swept data staying at or under
    operators/pairs.EXACT_MAX rows — past it the plan switches to the
    sampled-pair estimator the DuckDB oracle does NOT replay. Pin the
    boundary so a testdata regeneration with a longer calendar fails
    loudly here instead of as a silent sweep hash-mismatch."""
    from pyspark.sql import functions as F

    from stock_data_project_spark.operators.pairs import EXACT_MAX
    from stock_data_project_spark.plans.stock_next4 import _bars_rn

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        (mx,) = (
            _bars_rn(spark, sf)
            .groupBy("series_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0]
        )
        assert mx <= EXACT_MAX, (
            f"{sf}: max per-series bars {mx} > EXACT_MAX={EXACT_MAX} — "
            "the sampled pair path would desync the DuckDB oracle"
        )
