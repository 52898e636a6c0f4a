#!/usr/bin/env python
"""Deterministic per-key execution-shape probe: jobs, stages and
tasks submitted for one noop-sink run of each named key (plus wall
seconds for color). Job/stage/task counts are host-drift-free, unlike
wall clock on this shared box (SURVEY §6), so they are the A/B axis
optimization work trusts first; wall medians confirm direction.

Usage: python tools/count_probe.py key1 key2 ... [--sf DIR]
Prints one JSON line {key: {jobs, stages, tasks, wall}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_data_project_spark.plans import all_queries  # noqa: E402
from stock_data_project_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            keys.append(args[i])
            i += 1
    spark = get_spark(
        "count_probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sc = spark.sparkContext
    st = sc.statusTracker()
    queries = all_queries()
    unknown = [k for k in keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 1
    for k in keys:  # warmup: codegen, file index, any session memos
        queries[k](spark, sf_dir).write.mode("overwrite").format("noop").save()
    out = {}
    for k in keys:
        grp = f"cp_{k}"
        sc.setJobGroup(grp, k)
        t0 = time.perf_counter()
        queries[k](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        jobs = st.getJobIdsForGroup(grp)
        stages = tasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if not ji:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si:
                    stages += 1
                    tasks += si.numTasks
        out[k] = {
            "jobs": len(jobs),
            "stages": stages,
            "tasks": tasks,
            "wall": wall,
        }
    print(json.dumps({"sf_dir": sf_dir, "counts": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
