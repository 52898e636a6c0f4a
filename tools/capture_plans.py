#!/usr/bin/env python
"""Capture .explain("formatted") for the named keys into text files —
the judge-facing before/after plan evidence for optimization rounds.

Usage: python tools/capture_plans.py --out plans/r13 --suffix _before key1 key2 ...
(keys default to every bench HEADLINE key when none are given).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from stock_data_project_spark.plans import all_queries  # noqa: E402
from stock_data_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_dir = "plans/r13"
    suffix = "_before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1
    if not keys:
        keys = list(HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "capture_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    queries = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for k in keys:
        df = queries[k](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{k}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
