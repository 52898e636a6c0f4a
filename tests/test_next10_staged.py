"""r10-built keys staged for the r12 window (llm_next10
ann_recall_eval, stream_next9 stream_full_join, stock_next8
acf_returns / seasonal_decompose / holt_forecast / cusum_anomaly /
theil_sen_slope, olap_next11 welch_ttest / kruskal_wallis):
driver-identical parity plus per-operator semantic pins (numpy /
decimal independent-implementation pins for ACF, Welch, Kruskal,
CUSUM, and Theil-Sen)."""

from __future__ import annotations

import duckdb
import pytest

from stock_data_project_spark.plans import llm_next10, stream_next9
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_next10_keys_are_oracled():
    assert set(llm_next10.QUERIES_NEXT) == set(llm_next10.ORACLE_NEXT)
    assert set(stream_next9.QUERIES_NEXT) == set(stream_next9.ORACLE_NEXT)


# ------------------------------------------------------- ann_recall_eval


def test_ann_recall_eval_parity(spark):
    df = llm_next10.q_ann_recall_eval(spark, SF_ORACLE)
    assert_gradable_schema(df, "ann_recall_eval")
    assert df.count() > 0
    compare(df, duckdb_run(llm_next10.ORACLE_NEXT["ann_recall_eval"], SF_ORACLE))


def test_ann_recall_eval_parity_smoke(spark):
    df = llm_next10.q_ann_recall_eval(spark, SF_SMOKE)
    compare(df, duckdb_run(llm_next10.ORACLE_NEXT["ann_recall_eval"], SF_SMOKE))


def test_ann_recall_eval_planted_margin():
    """The provable-recall argument needs cross-anchor cosines well
    below the within-group 1.0 (6dp-rounded) — assert the margin on
    the real testdata rather than assuming it."""
    import numpy as np

    for sf in (SF_SMOKE, SF_ORACLE):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        m = con.sql(
            f"SELECT embedding FROM embeddings WHERE vec_id % {llm_next10._AR_K} = 0"
        ).fetchnumpy()
        a = np.stack([np.asarray(v, dtype=np.float64) for v in m["embedding"]])
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        s = a @ a.T
        np.fill_diagonal(s, -1.0)
        assert s.max() < 0.999999, (sf, s.max())


def test_ann_recall_eval_runs_with_arrow_disabled(spark):
    """The ivf search path crosses toPandas (query routing) — the
    driver's session does NOT enable Arrow (CLAUDE.md), so the key
    must survive the non-Arrow conversion path."""
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = llm_next10.q_ann_recall_eval(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["recall"] == 1.0
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)


def test_ann_recall_eval_detects_broken_routing(spark):
    """The grade is real: searching the planted corpus with the
    NON-planted queries' ids (wrong anchors → wrong groups) must not
    still produce the oracle arithmetic. Equivalent negative control:
    recall against a shifted group id is < 1 somewhere."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.ivf import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k = llm_next10._AR_K
    members = emb.select("vec_id", F.expr(f"vec_id DIV {k}").alias("gid"))
    anchors = emb.filter(F.col("vec_id") % k == 0).select(
        F.expr(f"vec_id DIV {k}").alias("gid"), F.col("embedding").alias("a_emb")
    )
    planted = members.join(anchors, "gid").select(
        "vec_id", F.col("a_emb").alias("embedding")
    )
    # queries deliberately mislabeled: anchor vector of gid, id of gid+1
    queries = (
        anchors.filter((F.col("gid") % 4 == 0) & (F.col("gid") < 20))
        .select(
            (-((F.col("gid") + 1) * k) - 1).alias("vec_id"),
            F.col("a_emb").alias("embedding"),
        )
    )
    topk = ivf_topk(planted, queries, k=k)
    hit = topk.filter(
        F.expr(f"neighbor_id DIV {k}") == F.expr(f"(-query_id - 1) DIV {k}")
    ).count()
    assert hit == 0  # retrieved vectors belong to the TRUE group, not the label


# ------------------------------------------------------ stream_full_join


def test_stream_full_join_parity(spark):
    df = stream_next9.stream_full_join(spark, SF_ORACLE)
    assert_gradable_schema(df, "stream_full_join")
    assert df.count() > 0
    compare(df, duckdb_run(stream_next9.ORACLE_NEXT["stream_full_join"], SF_ORACLE))


def test_stream_full_join_parity_smoke(spark):
    df = stream_next9.stream_full_join(spark, SF_SMOKE)
    compare(df, duckdb_run(stream_next9.ORACLE_NEXT["stream_full_join"], SF_SMOKE))


def test_stream_full_join_no_boundary_ties():
    """Both strict-< emission rules rely on no event landing exactly
    on the ms-truncated final watermark (view horizon ts+30min, click
    horizon ts) — assert the measure-zero assumption on the data."""
    for sf in (SF_SMOKE, SF_ORACLE):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        n_view, n_click = con.sql(
            f"""
            WITH fwm AS (
                SELECT least(
                    (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                     WHERE event_type = 'view'),
                    (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                     WHERE event_type = 'click')
                ) - CAST({stream_next9._SFJ_DELAY_US} AS BIGINT) AS wm
            )
            SELECT
              (SELECT count(*) FROM events, fwm WHERE event_type = 'view'
                AND epoch_us(ts) + {stream_next9._SFJ_INTERVAL_US} = fwm.wm),
              (SELECT count(*) FROM events, fwm WHERE event_type = 'click'
                AND epoch_us(ts) = fwm.wm)
            """
        ).fetchone()
        assert (n_view, n_click) == (0, 0), (sf, n_view, n_click)


def test_stream_full_join_click_side_semantics(spark):
    """The NEW emission rule this key grades: at least one
    null-extended CLICK row exists (the left-outer variant can never
    emit one), every such click sits strictly below the watermark,
    and unmatched clicks above it are withheld."""
    import pyspark.sql.functions as F

    out = stream_next9.stream_full_join(spark, SF_ORACLE)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    (wm,) = con.sql(
        f"""
        SELECT least(
            (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
             WHERE event_type = 'view'),
            (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
             WHERE event_type = 'click')
        ) - CAST({stream_next9._SFJ_DELAY_US} AS BIGINT)
        """
    ).fetchone()
    null_clicks = out.filter(F.col("view_id").isNull())
    n = null_clicks.count()
    assert n > 0
    late = null_clicks.filter(
        F.unix_micros(F.col("click_ts")) >= wm
    ).count()
    assert late == 0
    # withheld: no unmatched click at/above the horizon appears
    matched_clicks = {
        r[0]
        for r in out.filter(F.col("view_id").isNotNull() & F.col("click_id").isNotNull())
        .select("click_id")
        .collect()
    }
    emitted_null = {r[0] for r in null_clicks.select("click_id").collect()}
    all_clicks = con.sql(
        "SELECT event_id, epoch_us(ts) FROM events WHERE event_type = 'click'"
    ).fetchall()
    for cid, us in all_clicks:
        if cid in matched_clicks:
            continue
        assert (cid in emitted_null) == (us < wm), (cid, us, wm)


# --------------------------------------- acf / seasonal / welch (r10)


def test_stock8_and_welch_are_oracled():
    from stock_data_project_spark.plans import olap_next11, stock_next8

    assert set(stock_next8.QUERIES_NEXT) == set(stock_next8.ORACLE_NEXT)
    assert set(olap_next11.QUERIES_NEXT) == set(olap_next11.ORACLE_NEXT)


@pytest.mark.parametrize("key", ["acf_returns", "seasonal_decompose"])
def test_stock8_parity(spark, key):
    from stock_data_project_spark.plans import stock_next8

    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next8.QUERIES_NEXT[key](spark, sf)
        assert_gradable_schema(df, key)
        assert df.count() > 0
        compare(df, duckdb_run(stock_next8.ORACLE_NEXT[key], sf))


def test_welch_ttest_parity(spark):
    from stock_data_project_spark.plans import olap_next11

    for sf in (SF_SMOKE, SF_ORACLE):
        df = olap_next11.q_welch_ttest(spark, sf)
        assert_gradable_schema(df, "welch_ttest")
        assert df.count() > 0
        compare(df, duckdb_run(olap_next11.ORACLE_NEXT["welch_ttest"], sf))


def test_acf_centered_magnitude_bound(spark):
    """The DECIMAL(15,6) Spark-side cast for d (and the oracle's
    (19,6) twin) relies on |d| staying far from the width limit —
    assert the actual magnitude (largest seen so far ~1e3, bound
    1e8 leaves 10 bits of headroom before the cast could throw
    under ANSI)."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.returns import with_daily_return
    from stock_data_project_spark.operators.series import daily_bars

    for sf in (SF_SMOKE, SF_ORACLE):
        bars = with_daily_return(daily_bars(load_table(spark, sf, "events")))
        (mx,) = (
            bars.agg(F.max(F.abs(F.col("daily_return")))).collect()[0]
        )
        assert mx is not None and mx < 1e8, mx


def test_acf_lag1_matches_numpy(spark):
    """Semantic pin vs an independent implementation: numpy's
    centered autocovariance ratio at lag 1 (to 6dp) on one series."""
    import numpy as np

    from stock_data_project_spark.plans import stock_next8

    df = stock_next8.q_acf_returns(spark, SF_ORACLE).collect()
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    series = con.sql(
        """
        WITH bars AS (
            SELECT event_type AS sk, date_trunc('day', ts) AS d,
                   arg_max(value, ts) AS close
            FROM events GROUP BY 1, 2
        )
        SELECT sk, round((close - lag(close) OVER w)
                         / nullif(lag(close) OVER w, 0), 6) AS r
        FROM bars WINDOW w AS (PARTITION BY sk ORDER BY d)
        ORDER BY sk, d
        """
    ).fetchall()
    by_key: dict[str, list[float]] = {}
    for sk, r in series:
        if r is not None:
            by_key.setdefault(sk, []).append(r)
    for row in df:
        r = np.array(by_key[row["series_key"]])
        d = r - round(r.mean(), 6)
        expect = round(float((d[1:] * d[:-1]).sum() / (d * d).sum()), 5)
        assert row["acf1"] is not None
        assert abs(round(row["acf1"], 5) - expect) <= 1e-5, (
            row["series_key"], row["acf1"], expect,
        )


def test_seasonal_decompose_edges_and_reconstruction(spark):
    """Trend/residual NULL exactly on the 3-row edges of each series;
    where defined, trend + seasonal + residual reconstructs close to
    within the two 6dp roundings."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.plans import stock_next8

    df = stock_next8.q_seasonal_decompose(spark, SF_ORACLE)
    from pyspark.sql import Window

    w = Window.partitionBy("series_key").orderBy("date")
    wd = Window.partitionBy("series_key").orderBy(F.desc("date"))
    r = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rrn", F.row_number().over(wd))
    )
    assert r.filter((F.col("rn") <= 3) & F.col("trend").isNotNull()).count() == 0
    assert r.filter((F.col("rrn") <= 3) & F.col("trend").isNotNull()).count() == 0
    assert (
        r.filter((F.col("rn") > 3) & (F.col("rrn") > 3) & F.col("trend").isNull())
        .count()
        == 0
    )
    # reconstruction: |close − (trend + seasonal + residual)| ≤ 1e-6
    from stock_data_project_spark.catalog import load_table
    from stock_data_project_spark.operators.series import daily_bars

    bars = daily_bars(load_table(spark, SF_ORACLE, "events")).select(
        "series_key", "date", "close"
    )
    joined = df.filter(F.col("residual").isNotNull()).join(
        bars, ["series_key", "date"]
    )
    bad = joined.filter(
        F.abs(
            F.col("close")
            - (F.col("trend") + F.col("seasonal") + F.col("residual"))
        )
        > 1e-6
    ).count()
    assert bad == 0


def test_welch_ttest_matches_scipy_formula(spark):
    """Semantic pin vs an independent Welch computation (numpy,
    textbook formulas) to 4dp."""
    import numpy as np

    from stock_data_project_spark.plans import olap_next11

    rows = olap_next11.q_welch_ttest(spark, SF_ORACLE).collect()
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/customer.parquet')"
    )
    data = con.sql(
        "SELECT c_mktsegment, CAST(round(c_acctbal * 100, 0) AS BIGINT)"
        " FROM customer"
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, cents in data:
        by_seg.setdefault(seg, []).append(cents)
    for row in rows:
        a = np.array(by_seg[row["seg_a"]], dtype=np.float64)
        b = np.array(by_seg[row["seg_b"]], dtype=np.float64)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dfw = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(row["t_stat"] - t) < 1e-4, (row, t)
        assert abs(row["df_welch"] - dfw) < 1e-2 * max(1.0, dfw), (row, dfw)


def test_holt_forecast_parity(spark):
    from stock_data_project_spark.plans import stock_next8

    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next8.q_holt_forecast(spark, sf)
        assert_gradable_schema(df, "holt_forecast")
        assert df.count() > 0
        compare(df, duckdb_run(stock_next8.ORACLE_NEXT["holt_forecast"], sf))


def test_holt_forecast_flat_series_is_fixpoint(spark):
    """Semantic pin: on a constant series the smoother is a fixpoint —
    level = x, trend = 0, forecast = x at every step."""
    from decimal import Decimal

    import pandas as pd

    from stock_data_project_spark.plans.stock_next8 import q_holt_forecast

    # reuse the fold through the public plan by faking bars: easier to
    # drive the kernel directly on a constant frame
    from stock_data_project_spark.plans import stock_next8

    pdf = pd.DataFrame(
        {
            "series_key": ["k"] * 10,
            "date": pd.date_range("2024-01-01", periods=10, tz="UTC"),
            "rn": list(range(1, 11)),
            "c_d": [Decimal("42.500000")] * 10,
        }
    )
    sdf = spark.createDataFrame(pdf).selectExpr(
        "series_key", "date", "rn", "CAST(c_d AS DECIMAL(18,6)) AS c_d"
    )
    # replicate the plan's post-fold projection inline
    import pyspark.sql.functions as F

    folded = sdf.groupBy("series_key").applyInPandas(
        stock_next8._holt_fold,
        "series_key string, date timestamp, lvl_d decimal(18,6), tr_d decimal(18,6)",
    )
    rows = folded.collect()
    assert len(rows) == 10
    for r in rows:
        assert float(r["lvl_d"]) == 42.5
        assert float(r["tr_d"]) == 0.0


def test_cusum_and_kruskal_are_oracled():
    from stock_data_project_spark.plans import olap_next11, stock_next8

    assert "cusum_anomaly" in stock_next8.ORACLE_NEXT
    assert "kruskal_wallis" in olap_next11.ORACLE_NEXT


def test_cusum_anomaly_parity(spark):
    from stock_data_project_spark.plans import stock_next8

    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next8.q_cusum_anomaly(spark, sf)
        assert_gradable_schema(df, "cusum_anomaly")
        assert df.count() > 0
        compare(df, duckdb_run(stock_next8.ORACLE_NEXT["cusum_anomaly"], sf))


def test_cusum_alarm_mix_is_nontrivial(spark):
    """The h=45 threshold must grade a real decision boundary — some
    alarms, not all or none (the all-145 regression this key shipped
    with at h=0.04 would be invisible to parity alone)."""
    import pyspark.sql.functions as F

    from stock_data_project_spark.plans import stock_next8

    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next8.q_cusum_anomaly(spark, sf)
        n = df.count()
        a = df.agg(F.sum("alarm")).collect()[0][0]
        assert 0 < a < n, (sf, a, n)


def test_cusum_semantics_manual(spark):
    """Independent replay of the fold on one series pulled via the
    oracle's own return construction."""
    from decimal import Decimal

    from stock_data_project_spark.plans import stock_next8

    rows = (
        stock_next8.q_cusum_anomaly(spark, SF_ORACLE)
        .filter("series_key = 'click'")
        .orderBy("date")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    rets = con.sql(
        """
        WITH bars AS (
            SELECT date_trunc('day', ts) AS d, arg_max(value, ts) AS close
            FROM events WHERE event_type = 'click' GROUP BY 1
        )
        SELECT round((close - lag(close) OVER w) / nullif(lag(close) OVER w, 0), 6)
        FROM bars WINDOW w AS (ORDER BY d) ORDER BY d
        """
    ).fetchall()
    k, zero = Decimal("0.005"), Decimal("0")
    cp = cn = zero
    expected = []
    for (r,) in rets:
        if r is None:
            continue
        rd = Decimal(str(r))
        cp = max(zero, cp + (rd - k))
        cn = max(zero, cn - (rd + k))
        expected.append((float(cp), float(cn)))
    assert len(rows) == len(expected)
    for row, (ecp, ecn) in zip(rows, expected):
        assert abs(row["cusum_pos"] - ecp) < 1e-9
        assert abs(row["cusum_neg"] - ecn) < 1e-9


def test_kruskal_wallis_parity(spark):
    from stock_data_project_spark.plans import olap_next11

    for sf in (SF_SMOKE, SF_ORACLE):
        df = olap_next11.q_kruskal_wallis(spark, sf)
        assert_gradable_schema(df, "kruskal_wallis")
        assert df.count() == 1
        compare(df, duckdb_run(olap_next11.ORACLE_NEXT["kruskal_wallis"], sf))


def test_kruskal_wallis_matches_textbook(spark):
    """Independent H computation (numpy textbook formula with average
    ranks) on the real data, to 4dp."""
    import numpy as np

    from stock_data_project_spark.plans import olap_next11

    (row,) = olap_next11.q_kruskal_wallis(spark, SF_ORACLE).collect()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/customer.parquet')"
    )
    data = con.sql(
        "SELECT c_mktsegment, CAST(round(c_acctbal*100,0) AS BIGINT) FROM customer"
    ).fetchall()
    segs = sorted({s for s, _ in data})
    all_vals = np.array([v for _, v in data], dtype=np.float64)
    order = np.argsort(all_vals, kind="stable")
    ranks = np.empty(len(all_vals))
    sv = all_vals[order]
    i = 0
    pos = np.arange(1, len(sv) + 1, dtype=np.float64)
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = pos[i : j + 1].mean()
        i = j + 1
    n = len(all_vals)
    h = 0.0
    labels = np.array([s for s, _ in data])
    for s in segs:
        rs = ranks[labels == s]
        h += rs.sum() ** 2 / len(rs)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    assert abs(row["h_stat"] - h) < 1e-4, (row["h_stat"], h)


def test_kruskal_wallis_planted_ties_parity(spark, tmp_path):
    """The tie machinery (half-unit average ranks + t³−t correction)
    is not exercised by the tie-free testdata — plant heavy ties in a
    synthetic customer table and require full value-level parity AND
    h_corrected > h_stat."""
    import duckdb as ddb
    import pandas as pd

    from stock_data_project_spark.plans import olap_next11

    pdf = pd.DataFrame(
        {
            "c_custkey": list(range(60)),
            "c_name": [f"c{i}" for i in range(60)],
            "c_nationkey": [0] * 60,
            # three segments over a tiny tied domain with DIFFERENT
            # distributions (identical ones make H exactly 0)
            "c_mktsegment": (["A"] * 20 + ["B"] * 20 + ["C"] * 20),
            "c_acctbal": [float(v) for v in (
                [1.0, 2.0, 2.0, 3.0] * 5
                + [2.0, 3.0, 3.0, 4.0] * 5
                + [1.0, 1.0, 4.0, 4.0] * 5
            )],
        }
    )
    d = str(tmp_path)
    pdf.to_parquet(f"{d}/customer.parquet")
    df = olap_next11.q_kruskal_wallis(spark, d)
    con = ddb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{d}/customer.parquet')")
    od = con.sql(olap_next11.ORACLE_NEXT["kruskal_wallis"]).df()
    (srow,) = df.collect()
    assert len(od) == 1
    orow = od.iloc[0]
    assert srow["n_total"] == orow["n_total"] == 60
    assert srow["h_stat"] == orow["h_stat"]
    assert srow["h_corrected"] == orow["h_corrected"]
    assert srow["h_corrected"] > srow["h_stat"]  # C < 1 with real ties


def test_theil_sen_parity(spark):
    from stock_data_project_spark.plans import stock_next8

    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next8.q_theil_sen_slope(spark, sf)
        assert_gradable_schema(df, "theil_sen_slope")
        assert df.count() > 0
        compare(df, duckdb_run(stock_next8.ORACLE_NEXT["theil_sen_slope"], sf))


def test_theil_sen_matches_numpy(spark):
    """Independent implementation pin: numpy median of all pairwise
    slopes (rounded 6dp like the plan), to 5dp."""
    import numpy as np

    from stock_data_project_spark.plans import stock_next8

    rows = {
        r["series_key"]: r
        for r in stock_next8.q_theil_sen_slope(spark, SF_ORACLE).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    series = con.sql(
        """
        SELECT event_type, arg_max(value, ts) AS close
        FROM events GROUP BY event_type, date_trunc('day', ts)
        ORDER BY event_type, date_trunc('day', ts)
        """
    ).fetchall()
    by_key: dict[str, list[float]] = {}
    for k, c in series:
        by_key.setdefault(k, []).append(c)
    for k, closes in by_key.items():
        c = np.array(closes)
        slopes = []
        for i in range(len(c)):
            for j in range(i + 1, len(c)):
                slopes.append(round((c[j] - c[i]) / (j - i), 6))
        expect = float(np.median(np.array(slopes)))
        got = rows[k]["sen_slope"]
        assert rows[k]["n_pairs"] == len(slopes)
        assert abs(got - expect) < 1e-5, (k, got, expect)
