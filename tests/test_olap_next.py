"""Prebuilt r4 TPC-H shapes: the SAME value-level DuckDB comparison
the driver runs, applied now so the keys are parity-proven before
they debut in r4's correctness window (plans/olap_next.py explains
why they are not yet registered)."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans.olap_next import ORACLE_NEXT, QUERIES_NEXT
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare, duckdb_run


def test_every_prebuilt_key_has_an_oracle():
    assert set(QUERIES_NEXT) == set(ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(QUERIES_NEXT))
def test_olap_next_parity(spark, key):
    df = QUERIES_NEXT[key](spark, SF_ORACLE)
    assert df.count() > 0, f"{key}: empty result — predicate selects nothing"
    compare(df, duckdb_run(ORACLE_NEXT[key], SF_ORACLE))
