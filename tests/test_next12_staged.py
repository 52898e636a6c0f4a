"""Late-r10 keys staged for the r12 window (stock_next10 runs_test /
ljung_box / jarque_bera / sharpe_sortino / hurst_exponent,
olap_next12 one_way_anova / herfindahl_index, llm_next12 zipf_slope /
flesch_reading_ease / containment_pairs): driver-identical parity
plus independent implementation pins (numpy moments / OLS / textbook
replays, a pure-``re`` readability recount, a planted sub-document
containment construction) and the decimal-width bound assertions the
module docstrings promise."""

from __future__ import annotations

import math
import re

import duckdb
import numpy as np
import pytest

from stock_data_project_spark.plans import llm_next12, olap_next12, stock_next10
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_next12_keys_are_oracled():
    assert set(stock_next10.QUERIES_NEXT) == set(stock_next10.ORACLE_NEXT)
    assert set(olap_next12.QUERIES_NEXT) == set(olap_next12.ORACLE_NEXT)
    assert set(llm_next12.QUERIES_NEXT) == set(llm_next12.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(stock_next10.QUERIES_NEXT))
def test_stock_next10_parity(spark, key):
    for sf in (SF_SMOKE, SF_ORACLE):
        df = stock_next10.QUERIES_NEXT[key](spark, sf)
        assert_gradable_schema(df, key)
        assert df.count() > 0
        compare(df, duckdb_run(stock_next10.ORACLE_NEXT[key], sf))


@pytest.mark.parametrize("key", sorted(olap_next12.QUERIES_NEXT))
def test_olap_next12_parity(spark, key):
    for sf in (SF_SMOKE, SF_ORACLE):
        df = olap_next12.QUERIES_NEXT[key](spark, sf)
        assert_gradable_schema(df, key)
        assert df.count() > 0
        compare(df, duckdb_run(olap_next12.ORACLE_NEXT[key], sf))


@pytest.mark.parametrize("key", sorted(llm_next12.QUERIES_NEXT))
def test_llm_next12_parity(spark, key):
    for sf in (SF_SMOKE, SF_ORACLE):
        df = llm_next12.QUERIES_NEXT[key](spark, sf)
        assert_gradable_schema(df, key)
        assert df.count() > 0
        compare(df, duckdb_run(llm_next12.ORACLE_NEXT[key], sf))


# ------------------------------------------------------ semantic pins


def _returns_by_series(sf: str) -> dict[str, np.ndarray]:
    """6dp daily returns per series, exactly as the plans derive them."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    df = con.sql(
        """
        WITH bars AS (
            SELECT event_type AS sk, date_trunc('day', ts) AS d,
                   arg_max(value, ts) AS close
            FROM events GROUP BY 1, 2),
        ret AS (
            SELECT sk, d, round((close - lag(close) OVER w)
                                / nullif(lag(close) OVER w, 0), 6) AS r
            FROM bars WINDOW w AS (PARTITION BY sk ORDER BY d))
        SELECT sk, d, r FROM ret WHERE r IS NOT NULL ORDER BY sk, d
        """
    ).df()
    return {k: g["r"].to_numpy(dtype=np.float64) for k, g in df.groupby("sk")}


def test_runs_test_matches_textbook(spark):
    rows = {
        r["series_key"]: r
        for r in stock_next10.q_runs_test(spark, SF_ORACLE).collect()
    }
    for key, r in _returns_by_series(SF_ORACLE).items():
        r = r[r != 0.0]
        sgn = (r > 0).astype(int)
        runs = 1 + int((sgn[1:] != sgn[:-1]).sum())
        n1, n2, n = int(sgn.sum()), int((1 - sgn).sum()), len(sgn)
        mu = 1.0 + 2.0 * n1 * n2 / n
        var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
        z = (runs - mu) / math.sqrt(var)
        row = rows[key]
        assert (row["n_pos"], row["n_neg"], row["n_runs"]) == (n1, n2, runs)
        assert abs(row["z_runs"] - z) < 1e-6, (key, row["z_runs"], z)
        # the 2^53 exactness window the docstring promises
        assert 2.0 * n1 * n2 * (2.0 * n1 * n2 + n) < 2**53


def test_ljung_box_matches_numpy(spark):
    rows = {
        r["series_key"]: r
        for r in stock_next10.q_ljung_box(spark, SF_ORACLE).collect()
    }
    for key, r in _returns_by_series(SF_ORACLE).items():
        n = len(r)
        d = r - r.mean()
        q = 0.0
        for k in (1, 2, 3):
            rho = float((d[k:] * d[:-k]).sum() / (d * d).sum())
            q += rho * rho / (n - k)
        q *= n * (n + 2.0)
        row = rows[key]
        assert row["n_obs"] == n
        # the plan centers on the 6dp-rounded mean; numpy on the raw
        # mean — agreement to 1e-4 pins the statistic, not the bits
        assert abs(row["q_lb"] - q) < 1e-4 * max(1.0, abs(q)), (key, row["q_lb"], q)


def test_jarque_bera_matches_numpy(spark):
    rows = {
        r["series_key"]: r
        for r in stock_next10.q_jarque_bera(spark, SF_ORACLE).collect()
    }
    for key, r in _returns_by_series(SF_ORACLE).items():
        n = len(r)
        m = r.mean()
        d = r - m
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
        row = rows[key]
        assert abs(row["skewness"] - skew) < 1e-5 * max(1.0, abs(skew))
        assert abs(row["ex_kurtosis"] - kurt) < 1e-5 * max(1.0, abs(kurt))
        assert abs(row["jb_stat"] - jb) < 1e-4 * max(1.0, abs(jb))
        # decimal-width bounds the module docstring promises
        u = np.round(r * 1e6)
        assert np.abs(u).max() < 2e9
        assert (u.astype(object) ** 4).sum() < 10**38


def test_sharpe_sortino_matches_numpy(spark):
    rows = {
        r["series_key"]: r
        for r in stock_next10.q_sharpe_sortino(spark, SF_ORACLE).collect()
    }
    for key, r in _returns_by_series(SF_ORACLE).items():
        n = len(r)
        mean = r.mean()
        std = r.std(ddof=1)
        ddev = math.sqrt(float((np.minimum(r, 0.0) ** 2).mean()))
        row = rows[key]
        assert row["n_obs"] == n
        assert abs(row["mean_return"] - mean) < 1e-6
        assert abs(row["return_std"] - std) < 1e-6 * max(1.0, std)
        assert abs(row["sharpe"] - math.sqrt(252.0) * mean / std) < 1e-5 * max(
            1.0, abs(row["sharpe"])
        )
        assert abs(row["sortino"] - math.sqrt(252.0) * mean / ddev) < 1e-5 * max(
            1.0, abs(row["sortino"])
        )


def test_hurst_matches_textbook(spark):
    """Independent R/S replay: per-block rescaled range with the
    population std, 6dp-rounded, exact-average over blocks — the
    plan's arithmetic replicated in numpy (same roundings, so the
    match is exact)."""
    rows = {
        r["series_key"]: r
        for r in stock_next10.q_hurst_exponent(spark, SF_ORACLE).collect()
    }
    for key, r in _returns_by_series(SF_ORACLE).items():
        row = rows[key]
        rss = {}
        for m in (8, 16):
            vals = []
            for b in range(len(r) // m):
                blk = r[b * m : (b + 1) * m]
                # D_k for k = 1..m (D_m = 0 exactly in the plan's
                # integer walk, so the 0 anchor is always present)
                dev = np.cumsum(blk - blk.mean())
                rng = float(dev.max() - dev.min())
                s = float(blk.std(ddof=0))
                if s > 0:
                    vals.append(round(rng / s, 6))
            rss[m] = sum(vals) / len(vals)
            assert row[f"n_blocks_{m}"] == len(vals)
        assert abs(row["rs8"] - rss[8]) < 2e-6
        assert abs(row["rs16"] - rss[16]) < 2e-6
        h = math.log(rss[16] / rss[8]) / math.log(2.0)
        assert abs(row["hurst"] - h) < 1e-4, (key, row["hurst"], h)


def test_one_way_anova_matches_numpy(spark):
    row = olap_next12.q_one_way_anova(spark, SF_ORACLE).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/customer.parquet')"
    )
    df = con.sql(
        "SELECT c_mktsegment AS seg,"
        " CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer"
    ).df()
    groups = [g["cents"].to_numpy(dtype=np.float64) for _, g in df.groupby("seg")]
    allv = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta = ssb / (ssb + ssw)
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert abs(row["f_stat"] - f) < 1e-5 * max(1.0, abs(f))
    assert abs(row["eta_sq"] - eta) < 1e-6
    assert abs(row["ss_between"] - ssb) < 1.0  # ~1e13-scale double sums
    assert abs(row["ss_within"] - ssw) < 1.0


def test_herfindahl_invariants(spark):
    rows = olap_next12.q_herfindahl_index(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        n = r["n_suppliers"]
        # HHI of n shares lies in [1/n, 1]; rounded shares drift by
        # at most n·1e-6 off the simplex
        assert 1.0 / n - 1e-4 <= r["hhi"] <= 1.0 + 1e-4, r
        assert 1.0 / n - 1e-6 <= r["top_share"] <= 1.0
        assert r["hhi"] <= r["top_share"] + 1e-6 or n == 1


def test_zipf_slope_matches_numpy_and_is_zipfian(spark):
    rows = {r["source"]: r for r in llm_next12.q_zipf_slope(spark, SF_ORACLE).collect()}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    df = con.sql(
        rf"""
        WITH toks AS (
            SELECT source, unnest(string_split(
                regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
            FROM documents WHERE text IS NOT NULL),
        cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2)
        SELECT source, c FROM cnt
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY c DESC, tok ASC) <= 100
        ORDER BY source, c DESC
        """
    ).df()
    for src, g in df.groupby("source"):
        c = np.sort(g["c"].to_numpy(dtype=np.float64))[::-1]
        x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
        y = np.log(c)
        slope, intercept = np.polyfit(x, y, 1)
        row = rows[src]
        assert row["n_terms"] == len(c)
        assert abs(row["zipf_slope"] - slope) < 1e-4, (src, row["zipf_slope"], slope)
        assert abs(row["zipf_intercept"] - intercept) < 1e-4
        assert row["zipf_slope"] < 0  # frequency falls with rank


def test_flesch_matches_pure_python(spark):
    rows = llm_next12.q_flesch_reading_ease(spark, SF_ORACLE).limit(200).collect()
    con = duckdb.connect()
    texts = dict(
        con.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF_ORACLE}/documents.parquet')"
            " WHERE text IS NOT NULL"
        ).fetchall()
    )
    for r in rows:
        t = texts[r["doc_id"]]
        ns = len(re.findall(r"[.!?]+", t))
        nw = len(re.findall(r"[a-z]+", t.lower()))
        ny = len(re.findall(r"[aeiouy]+", t.lower()))
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (ns, nw, ny)
        if ns and nw:
            fre = 206.835 - 1.015 * (nw / ns) - 84.6 * (ny / nw)
            assert abs(r["flesch"] - fre) < 1e-5
        else:
            assert r["flesch"] is None


def test_containment_detects_planted_subdocument(spark):
    """A short doc wholly embedded in a same-block longer doc must
    reach containment 1.0 in the short→long direction even though
    jaccard is far below any dedup threshold — the asymmetric-measure
    point of the key."""
    from stock_data_project_spark.operators.dedup import blocked_containment_pairs

    short = "alpha beta gamma delta"
    long = short + " " + " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, short, "en", 50),
            (2, long, "en", 60),  # same 100-char bucket
            (3, "unrelated words entirely", "en", 55),
        ],
        "doc_id int, text string, lang string, n_chars int",
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in blocked_containment_pairs(df, threshold=0.5).collect()
    }
    r = got[(1, 2)]
    assert r["containment_a"] == 1.0
    assert r["containment_b"] < 0.2
    assert (1, 3) not in got and (2, 3) not in got


def test_containment_pairs_consistency_with_jaccard(spark):
    """containment and jaccard agree on the identity
    1/jaccard = |A|/inter + |B|/inter − 1 for every emitted pair that
    the jaccard key also emits (threshold permitting)."""
    cont = {
        (r["doc_id_a"], r["doc_id_b"]): r
        for r in llm_next12.q_containment_pairs(spark, SF_SMOKE).collect()
    }
    from stock_data_project_spark.plans.llm import q_ngram_jaccard

    jac = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in q_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    shared = set(cont) & set(jac)
    assert shared, "expected overlapping pairs between jaccard and containment"
    for pair in sorted(shared)[:50]:
        r = cont[pair]
        ca, cb, j = r["containment_a"], r["containment_b"], jac[pair]
        # 1/j = 1/ca + 1/cb − 1 (exact set identity, 6dp-rounded inputs)
        assert abs(1.0 / j - (1.0 / ca + 1.0 / cb - 1.0)) < 1e-3, (pair, ca, cb, j)


# ------------------------- second late-r10 batch (stock_next11/olap_next13)


def test_next12b_keys_are_oracled():
    from stock_data_project_spark.plans import olap_next13, stock_next11

    assert set(stock_next11.QUERIES_NEXT) == set(stock_next11.ORACLE_NEXT)
    assert set(olap_next13.QUERIES_NEXT) == set(olap_next13.ORACLE_NEXT)


@pytest.mark.parametrize(
    "key", ["variance_ratio", "seasonality_strength", "event_mutual_info"]
)
def test_next12b_parity(spark, key):
    from stock_data_project_spark.plans import olap_next13, stock_next11

    mod = olap_next13 if key in olap_next13.QUERIES_NEXT else stock_next11
    for sf in (SF_SMOKE, SF_ORACLE):
        df = mod.QUERIES_NEXT[key](spark, sf)
        assert_gradable_schema(df, key)
        assert df.count() > 0
        compare(df, duckdb_run(mod.ORACLE_NEXT[key], sf))


def test_variance_ratio_matches_numpy(spark):
    from stock_data_project_spark.plans import stock_next11

    rows = {
        r["series_key"]: r
        for r in stock_next11.q_variance_ratio(spark, SF_ORACLE).collect()
    }
    q = 5
    for key, r in _returns_by_series(SF_ORACLE).items():
        rq = np.convolve(r, np.ones(q), mode="valid")
        vr = rq.var(ddof=1) / (q * r.var(ddof=1))
        n = len(r)
        z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n))
        row = rows[key]
        assert row["n_obs"] == n and row["n_windows"] == len(rq)
        assert abs(row["vr"] - vr) < 1e-5 * max(1.0, vr), (key, row["vr"], vr)
        assert abs(row["z_vr"] - z) < 1e-4 * max(1.0, abs(z))


def test_seasonality_strength_matches_numpy(spark):
    """Independent replay: centered 7-day MA trend, per-dow seasonal
    mean of the detrended residue, variance ratios — numpy doubles
    agree with the plan's exact-decimal path to ~1e-5 (the plan's
    6dp roundings are the only divergence)."""
    import pandas as pd
    from stock_data_project_spark.plans import stock_next11

    rows = {
        r["series_key"]: r
        for r in stock_next11.q_seasonality_strength(spark, SF_ORACLE).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_ORACLE}/events.parquet')"
    )
    bars = con.sql(
        """SELECT event_type AS sk, date_trunc('day', ts) AS d,
                  arg_max(value, ts) AS close,
                  CAST((epoch_us(date_trunc('day', ts)) // 86400000000) % 7 AS INT)
                      AS dow
           FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    for key, g in bars.groupby("sk"):
        c = g["close"].to_numpy(dtype=np.float64)
        trend = pd.Series(c).rolling(7, center=True).mean().to_numpy()
        det = c - trend
        dow = g["dow"].to_numpy()
        seas = np.array(
            [np.nanmean(det[dow == dw]) if np.isfinite(det[dow == dw]).any() else np.nan for dw in dow]
        )
        mask = np.isfinite(det)
        res = det[mask] - seas[mask]
        des = c[mask] - seas[mask]
        fs = max(0.0, 1.0 - res.var(ddof=1) / det[mask].var(ddof=1))
        ft = max(0.0, 1.0 - res.var(ddof=1) / des.var(ddof=1))
        row = rows[key]
        assert row["n_obs"] == int(mask.sum())
        assert abs(row["seasonal_strength"] - fs) < 1e-4, (key, row["seasonal_strength"], fs)
        assert abs(row["trend_strength"] - ft) < 1e-4


def test_event_mutual_info_matches_numpy(spark):
    from stock_data_project_spark.plans import olap_next13

    row = olap_next13.q_event_mutual_info(spark, SF_ORACLE).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_ORACLE}/events.parquet')"
    )
    cells = con.sql(
        """SELECT event_type, CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS h,
                  count(*) AS c
           FROM events GROUP BY 1, 2"""
    ).df()
    n = cells["c"].sum()
    cx = cells.groupby("event_type")["c"].sum()
    cy = cells.groupby("h")["c"].sum()
    mi = sum(
        (r.c / n) * math.log(r.c * n / (cx[r.event_type] * cy[r.h]))
        for r in cells.itertuples()
    )
    hx = -sum((v / n) * math.log(v / n) for v in cx)
    hy = -sum((v / n) * math.log(v / n) for v in cy)
    assert row["n_events"] == n and row["n_cells"] == len(cells)
    assert abs(row["mi_nats"] - mi) < 1e-5
    assert abs(row["h_type"] - hx) < 1e-5
    assert abs(row["h_hour"] - hy) < 1e-5
    assert abs(row["nmi"] - mi / min(hx, hy)) < 1e-4
    assert 0.0 <= row["nmi"] <= 1.0 + 1e-9
