#!/usr/bin/env python
"""Solo per-key bench probe for optimization work: times the named
keys exactly like bench.py (noop sink, one warmup pass, median of N
measured runs) without paying for the full 129-key headline sweep.

Usage: python tools/key_probe.py key1 key2 ... [--runs N] [--sf DIR]
Prints one JSON line {key: median_sec}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_data_project_spark.plans import all_queries  # noqa: E402
from stock_data_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1
    spark = get_spark(
        "key_probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    queries = all_queries()
    unknown = [k for k in keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 1

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    for k in keys:  # warmup (codegen + file-index one-time costs)
        run(k)
    gc.collect()
    samples = {k: sorted(run(k) for _ in range(runs)) for k in keys}
    gc.collect()
    out = {
        k: round(
            v[len(v) // 2]
            if len(v) % 2
            else (v[len(v) // 2 - 1] + v[len(v) // 2]) / 2,
            3,
        )
        for k, v in samples.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "medians": out, "raw": samples}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
