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
