#!/usr/bin/env python
"""Time the DuckDB oracles of the headline queries on the same
parquet at the same scale factor — the single-node engine the
reference project uses, as a throughput baseline for bench.py.

Usage: python tools/baseline_duckdb.py   (honors SPARK_GRAFT_SF_DIR)
Prints one JSON line {"queries": {name: sec}, "total": sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from stock_data_project_spark.catalog import TABLES, table_path  # noqa: E402
from stock_data_project_spark.plans import all_oracles  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    oracles = all_oracles()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    keys = [k for k in HEADLINE if k in oracles]
    # Arrow bulk transfer, not fetchall(): per-row Python tuple
    # conversion would bill result-set size to DuckDB in a way the
    # Spark noop sink never pays, biasing the comparison
    for k in keys:  # warmup (buffer cache, JIT-ish costs)
        con.sql(oracles[k]).arrow()
    timings = {}
    for k in keys:
        t0 = time.perf_counter()
        con.sql(oracles[k]).arrow()
        timings[k] = round(time.perf_counter() - t0, 3)
    skipped = [k for k in HEADLINE if k not in oracles]
    print(
        json.dumps(
            {
                "engine": "duckdb",
                "sf_dir": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
                "no_oracle": skipped,
            }
        )
    )


if __name__ == "__main__":
    main()
