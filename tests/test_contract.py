"""Driver-contract invariants: SURVEY §2 and __spark_entry__ must
stay in lockstep (the coverage checklist is graded line by line)."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod


def test_survey_covers_every_query():
    surv = open("SURVEY.md").read()
    in_survey = set(re.findall(r"^\| `([a-z0-9_]+)` \|", surv, re.M))
    qkeys = set(entrymod.queries())
    missing = qkeys - in_survey
    assert not missing, f"queries missing from SURVEY §2: {sorted(missing)}"


def test_every_oracle_key_has_a_query():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_rows_only_queries_are_documented():
    surv = open("SURVEY.md").read()
    rows_only = set(entrymod.queries()) - set(entrymod.oracle_sql())
    for k in rows_only:
        # the §2 TABLE ROW for the key, not any prose mention
        line = next(
            (ln for ln in surv.splitlines() if ln.startswith(f"| `{k}` |")), ""
        )
        assert line, f"{k} has no SURVEY §2 table row"
        assert "rows-only" in line, f"{k} lacks a rows-only annotation in SURVEY §2"


def test_driver_evidence_staleness():
    """r11 verdict item 3: the r7-evidence cohort went four rounds
    stale silently. Every queries() key must either have a driver row
    at most MAX_AGE rounds older than the newest CORRECTNESS artifact,
    or sit inside the committed next window (plans._GRADE_ORDER) so
    fresh evidence is already scheduled."""
    import glob
    import json

    from stock_data_project_spark.plans import _GRADE_ORDER, STAGED_DEBUTS

    latest: dict[str, int] = {}
    rounds = []
    for p in sorted(glob.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", p).group(1))
        rounds.append(r)
        for k in json.load(open(p)):
            latest[k] = r
    if not rounds:  # fresh clone without driver artifacts
        return
    newest = max(rounds)
    MAX_AGE = 4  # a key graded r8 is acceptable while r12 is newest
    window = set(_GRADE_ORDER)
    offenders = sorted(
        k
        for k in entrymod.queries()
        if k not in window
        and (
            # never graded: must be an explicitly declared staged
            # debut for the next window
            k not in STAGED_DEBUTS
            if k not in latest
            else newest - latest[k] > MAX_AGE
        )
    )
    assert not offenders, (
        f"driver evidence older than {MAX_AGE} rounds (or never-graded "
        f"without a STAGED_DEBUTS declaration) and not in the committed "
        f"window: {offenders}"
    )
    # a staged debut that already has evidence is a stale declaration
    stale_staged = sorted(STAGED_DEBUTS & set(latest))
    assert not stale_staged, (
        f"STAGED_DEBUTS keys already driver-graded (rotate them into "
        f"_GRADE_ORDER and drop the declaration): {stale_staged}"
    )


def test_every_graded_survey_row_has_a_query():
    """Tightened r11 invariant (r10 verdict item 4): §2 graded-key
    rows == queries() EXACTLY — a graded-format row (backticked key,
    no ``(lib)`` prefix) with no queries() entry is either a stale
    row or an ungradeable key that must be re-annotated ``(lib)``."""
    surv = open("SURVEY.md").read()
    in_survey = set(re.findall(r"^\| `([a-z0-9_]+)` \|", surv, re.M))
    qkeys = set(entrymod.queries())
    stale = in_survey - qkeys
    assert not stale, f"SURVEY §2 graded rows without a query: {sorted(stale)}"
