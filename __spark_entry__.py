"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema fact build
(SURVEY.md §2: ``fact_build``) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full SURVEY §2 inventory; pairs are
compared by the driver against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives beside this file; make the import robust
# to whatever cwd/sys.path the harness uses
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from stock_data_project_spark.plans import all_oracles, all_queries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["fact_build"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
