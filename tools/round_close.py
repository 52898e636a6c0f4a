"""One-command round-close ritual.

Runs the six evidence steps serially (each solo, so bench numbers are
uncontended), parses each step's verdict line, prints ONE summary
JSON, and exits non-zero if anything failed:

  1. events.ts layout re-probe (pyarrow; the catalog invariant)
  2. full test gate        python -m pytest tests/ -x -q
  3. sf0.1 parity sweep    tools/parity_sweep.py
  4. physical-plan audit   tools/plan_audit.py
  5. driver-session smoke  tools/driver_session_smoke.py
  6. bench + DuckDB baseline (ratio computed over shared keys)

Usage: python tools/round_close.py [--skip-gate]
(--skip-gate when the full gate already ran green this session and
nothing changed since — the other five steps are cheap enough to
always rerun.)

The per-step logs land in /tmp/round_close_<step>.log for forensics.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(step: str, cmd: list[str], timeout: int) -> tuple[int, str]:
    log = f"/tmp/round_close_{step}.log"
    t0 = time.perf_counter()
    with open(log, "w") as fh:
        try:
            rc = subprocess.run(
                cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT, timeout=timeout
            ).returncode
        except subprocess.TimeoutExpired:
            # a hung step is a FAILED step, not a ritual crash — the
            # summary JSON must still come out (r10 ADVICE)
            rc = -1
            fh.write(f"\n[round_close] {step}: TIMEOUT after {timeout}s\n")
    dur = round(time.perf_counter() - t0, 1)
    print(f"[round_close] {step}: rc={rc} ({dur}s, log={log})", flush=True)
    return rc, open(log, errors="replace").read()


def main() -> int:
    skip_gate = "--skip-gate" in sys.argv
    summary: dict = {}
    failed = []

    # 1. ts layout probe
    import pyarrow.parquet as pq

    layouts = {
        sf: str(pq.read_schema(f"/root/testdata/{sf}/events.parquet").field("ts").type)
        for sf in ("sf0.001", "sf0.01", "sf0.1")
    }
    summary["events_ts"] = layouts
    print(f"[round_close] events.ts: {layouts}", flush=True)

    # 2. gate
    if skip_gate:
        summary["gate"] = "skipped (--skip-gate)"
    else:
        rc, out = _run(
            "gate", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], 3600
        )
        m = re.search(r"(\d+) passed[^\n]*in ([\d.]+)s", out)
        summary["gate"] = m.group(0) if m else out[-200:]
        if rc:
            failed.append("gate")

    # 3. parity sweep
    rc, out = _run("sweep", [sys.executable, "tools/parity_sweep.py"], 3600)
    m = re.search(r"parity [^:]+: (\d+)/(\d+) OK", out)
    summary["sweep"] = m.group(0) if m else out[-200:]
    if rc:
        failed.append("sweep")

    # 4. plan audit
    rc, out = _run("audit", [sys.executable, "tools/plan_audit.py"], 3600)
    try:
        d = json.loads(out.strip().splitlines()[-1])
        summary["audit"] = {
            "plans": len(d["queries"]),
            "flagged": d["flagged"],
            "cartesian": sum(1 for q in d["queries"].values() if q["cartesian"]),
        }
    except Exception:
        summary["audit"] = out[-200:]
    if rc:
        failed.append("audit")

    # 5. driver-session smoke
    rc, out = _run("smoke", [sys.executable, "tools/driver_session_smoke.py"], 3600)
    m = re.search(r"driver-session smoke: (\d+)/(\d+) OK", out)
    summary["smoke"] = m.group(0) if m else out[-200:]
    if rc:
        failed.append("smoke")

    # 6. bench + baseline ratio
    rc, out = _run("bench", [sys.executable, "bench.py"], 3600)
    bench = None
    for line in out.splitlines():
        if '"metric"' in line:
            bench = json.loads(line)
    if bench is None or rc:
        failed.append("bench")
        summary["bench"] = out[-200:]
    else:
        fails = [k for k, v in bench["queries"].items() if v is None]
        summary["bench"] = {
            "total_sec": bench["value"],
            "keys": len(bench["queries"]),
            "failures": fails,
        }
        if fails:
            failed.append("bench")

    rc, out = _run("baseline", [sys.executable, "tools/baseline_duckdb.py"], 3600)
    base = None
    for line in out.splitlines():
        if '"total"' in line:
            base = json.loads(line)
    if base is None or rc:
        failed.append("baseline")
        summary["baseline"] = out[-200:]
    else:
        # record the baseline's own numbers even when the bench step
        # failed to parse (r10 ADVICE: the elif dropped them); the
        # ratio needs both sides
        summary["baseline"] = {
            "duckdb_total_sec": round(sum(base["queries"].values()), 1),
            "duckdb_keys": len(base["queries"]),
        }
        if bench is not None:
            shared = {
                k: (bench["queries"][k], v)
                for k, v in base["queries"].items()
                if bench["queries"].get(k) is not None
            }
            st = sum(s for s, _ in shared.values())
            dt = sum(d for _, d in shared.values())
            summary["baseline"].update(
                {
                    "shared_keys": len(shared),
                    "spark_sec": round(st, 1),
                    "duckdb_sec": round(dt, 1),
                    "ratio": round(st / dt, 3) if dt else None,
                }
            )

    summary["failed_steps"] = failed
    print(json.dumps(summary))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
