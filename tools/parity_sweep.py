#!/usr/bin/env python
"""Full value-level oracle parity sweep at an arbitrary SF — the
manual per-round chore from SURVEY §5, as one command.

This is the same comparison as tests/test_oracle_parity.py but at
sf0.1 by default (the driver and the in-repo suite both gate at
sf0.01, where tiny inputs can mask sampling-dependent bugs: the r3
distributed_ntile ReuseExchange/pruning defect was green at sf0.01 —
range boundaries are sampled exhaustively on tiny inputs — and only
wrong at sf0.1).

Usage: python tools/parity_sweep.py [sf_dir]
Prints one line per failure and a final OK count; exit 1 on any fail.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_data_project_spark.plans import all_oracles, all_queries  # noqa: E402
from stock_data_project_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare, duckdb_run  # noqa: E402


def main() -> int:
    # args: [sf_dir] [key ...] — a leading path-looking arg selects the
    # SF dir; any further args restrict the sweep to those keys (the
    # per-change verification loop of an optimization round shouldn't
    # pay the full 237-key sweep for a one-operator diff)
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and ("/" in args[0] or os.path.isdir(args[0])):
        sf_dir = args[0]
        args = args[1:]
    only = set(args)
    spark = get_spark(
        "parity_sweep", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs, oq = all_queries(), all_oracles()
    if only:
        unknown = only - set(oq)
        if unknown:
            print(f"unknown/or not oracled keys: {sorted(unknown)}")
            return 1
        oq = {k: v for k, v in oq.items() if k in only}
    # staged *_next keys sweep too — they are one round from debut,
    # and this sweep (not sf0.01) is what catches the
    # sampling-dependent class (distributed_ntile, r3).
    # Since r5 every implemented key is registered in all_queries()
    # (staging is window position, not absence), so there is no
    # separate staged set to merge — the sweep covers everything by
    # construction.
    ok, fails = 0, []
    for key in sorted(oq):
        try:
            compare(qs[key](spark, sf_dir), duckdb_run(oq[key], sf_dir))
            ok += 1
        except Exception as e:  # noqa: BLE001 — report every key
            fails.append((key, str(e).splitlines()[0][:200]))
    for key, err in fails:
        print(f"FAIL {key}: {err}")
    print(f"parity {sf_dir}: {ok}/{len(oq)} OK")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
