"""Every oracled query in the SURVEY §2 inventory must match its
DuckDB oracle at sf0.01 — the in-repo twin of the driver's t2 gate."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans import all_oracles, all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare, duckdb_run

ORACLED = sorted(all_oracles().keys())


@pytest.mark.parametrize("key", ORACLED)
def test_oracle_parity(spark, key):
    q = all_queries()[key]
    sql = all_oracles()[key]
    compare(q(spark, SF_ORACLE), duckdb_run(sql, SF_ORACLE))


def test_all_queries_run(spark):
    """Rows-only keys (no oracle) at least execute and return a schema."""
    for key, q in all_queries().items():
        if key in all_oracles():
            continue
        df = q(spark, SF_ORACLE)
        assert df.columns
        assert df.count() >= 0, key
