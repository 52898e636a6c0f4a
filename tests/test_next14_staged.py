"""r12-built corpus-governance keys staged for the r13 window
(llm_next14: segment_dedup / exact_substring_spans /
source_quality_gate / source_quota_resample): driver-identical parity
at sf0.001+sf0.01 plus each operator's semantic pins on planted
synthetic corpora (the graded corpus has no exact-dup docs, so the
full-drop / full-coverage branches only execute here)."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans import llm_next14
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_keys_are_oracled():
    assert set(llm_next14.QUERIES_NEXT) == set(llm_next14.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(llm_next14.QUERIES_NEXT))
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_parity(spark, key, sf):
    df = llm_next14.QUERIES_NEXT[key](spark, sf)
    assert_gradable_schema(df, key)
    assert df.count() > 0, key
    compare(df, duckdb_run(llm_next14.ORACLE_NEXT[key], sf))


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _duckdb_docs_run(sql: str, sf_dir: str):
    """duckdb_run twin for synthetic dirs that only carry documents."""
    import duckdb

    con = duckdb.connect()
    # Spark writes documents.parquet as a DIRECTORY of part files
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.sql(sql).df()


def test_segment_dedup_semantics(spark, tmp_path):
    """Exact-dup doc retains nothing; the first occurrence keeps
    everything; token totals reconstruct the corpus."""
    w30 = " ".join(f"w{i}" for i in range(30))  # 3 full segments
    other = " ".join(f"x{i}" for i in range(25))  # 2 full + 1 partial
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, w30, "en", "src0", len(w30)),
            (2, w30, "en", "src1", len(w30)),  # exact dup of doc 1
            (3, other, "en", "src2", len(other)),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in llm_next14.q_segment_dedup(spark, sf).collect()
    }
    assert got[1]["n_segments_kept"] == 3 and got[1]["n_tokens_kept"] == 30
    assert got[2]["n_segments_kept"] == 0 and got[2]["n_tokens_kept"] == 0
    assert got[2]["retained_ratio"] == 0.0
    assert got[3]["n_segments"] == 3 and got[3]["n_tokens"] == 25
    assert got[3]["retained_ratio"] == 1.0
    # oracle agrees on the planted frame too
    compare(
        llm_next14.q_segment_dedup(spark, sf),
        _duckdb_docs_run(llm_next14.ORACLE_NEXT["segment_dedup"], sf),
    )


def test_segment_dedup_is_nondegenerate_on_graded_corpus(spark):
    import pyspark.sql.functions as F

    df = llm_next14.q_segment_dedup(spark, SF_ORACLE)
    row = df.agg(
        F.sum(F.expr("n_segments - n_segments_kept")).alias("dropped"),
        F.sum("n_tokens").alias("toks"),
    ).collect()[0]
    assert row["dropped"] > 0, "no duplicate segments — grade is trivial"
    # token totals reconstruct the corpus exactly
    import duckdb

    con = duckdb.connect()
    (want,) = con.sql(
        "SELECT sum(len(string_split(regexp_replace(lower(trim(text)),"
        f"'\\s+',' ','g'),' '))) FROM read_parquet('{SF_ORACLE}/documents.parquet')"
    ).fetchone()
    assert row["toks"] == want


def test_exact_substring_spans_semantics(spark, tmp_path):
    """A 15-token span shared by two docs produces one maximal run of
    exactly 15 covered tokens in each (starts 0..5 merge: 6+10-1);
    within-doc repetition of a 10-gram is duplicated too (the
    suffix-array semantics); a unique doc reports zeros."""
    shared = " ".join(f"s{i}" for i in range(15))
    a = shared + " " + " ".join(f"a{i}" for i in range(20))
    b = " ".join(f"b{i}" for i in range(20)) + " " + shared
    rep10 = " ".join(f"r{i}" for i in range(10))
    c = rep10 + " " + " ".join(f"c{i}" for i in range(12)) + " " + rep10
    d = " ".join(f"d{i}" for i in range(30))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, a, "en", "src0", len(a)),
            (2, b, "en", "src1", len(b)),
            (3, c, "en", "src2", len(c)),
            (4, d, "en", "src3", len(d)),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in llm_next14.q_exact_substring_spans(spark, sf).collect()
    }
    assert got[1]["n_dup_runs"] == 1 and got[1]["dup_tokens"] == 15
    assert got[1]["max_run_tokens"] == 15
    assert got[2]["n_dup_runs"] == 1 and got[2]["dup_tokens"] == 15
    assert got[3]["n_dup_runs"] == 2 and got[3]["dup_tokens"] == 20
    assert got[3]["max_run_tokens"] == 10
    assert got[4]["n_dup_runs"] == 0 and got[4]["dup_tokens"] == 0
    assert got[4]["dup_fraction"] == 0.0
    compare(
        llm_next14.q_exact_substring_spans(spark, sf),
        _duckdb_docs_run(llm_next14.ORACLE_NEXT["exact_substring_spans"], sf),
    )


def test_source_gate_mixes_decisions_and_shares_sum(spark):
    rows = llm_next14.q_source_quality_gate(spark, SF_ORACLE).collect()
    keeps = sum(r["keep"] for r in rows)
    assert 0 < keeps < len(rows), "gate must split the sources"
    # token_share is a per-source exact 6dp of share — sums to 1 ± 20
    # rounding units
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 2e-5
    assert all(r["type_token_ratio"] <= 1.0 for r in rows)


def test_source_quota_enforced_and_deterministic(spark):
    from collections import defaultdict

    rows = llm_next14.q_source_quota_resample(spark, SF_ORACLE).collect()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r)
    for src, rs in per_src.items():
        kept_tokens = sum(r["n_tokens"] for r in rs if r["kept"] == 1)
        assert kept_tokens <= llm_next14._QUOTA, src
        # every kept doc's cumsum is inside the quota, every dropped
        # doc's is outside — keep is EXACTLY the cumsum predicate
        for r in rs:
            assert (r["cum_tokens"] <= llm_next14._QUOTA) == (r["kept"] == 1)
        assert any(r["kept"] == 0 for r in rs), f"{src}: quota never binds"
    again = llm_next14.q_source_quota_resample(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
