"""Staged r5 LLM-pipeline keys: the SAME value-level DuckDB
comparison the driver runs, applied before the keys debut
(plans/llm_next.py explains the window timing). ``ann_pq`` is
rows-only (approximate by design) — it executes here; its semantics
are pinned in tests/test_pq.py."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans.llm_next import ORACLE_NEXT, QUERIES_NEXT
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run

ROWS_ONLY = {"ann_pq", "ann_ivfpq"}


def test_every_staged_key_has_an_oracle():
    assert set(QUERIES_NEXT) - ROWS_ONLY == set(ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(QUERIES_NEXT))
def test_llm_next_parity(spark, key):
    df = QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0, f"{key}: empty result"
    if key not in ROWS_ONLY:
        compare(df, duckdb_run(ORACLE_NEXT[key], SF_ORACLE))

