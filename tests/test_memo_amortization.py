"""Fit-memo amortization under a driver-shaped session (r12 verdict
item 6): the SECOND invocation of a fit-memoized key in one session
must not re-run its fit — the memo key and application-scoped cache
are exactly what the r12 `ann_pq` bench investigation leaned on, so a
regression here silently reintroduces a fit job per bench pass.

Arrow is disabled for the invocations (the driver session never
enables it — CLAUDE.md), so a memo path that only works under the
repo's Arrow-on session fails here.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def arrow_off(spark):
    prev = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", prev)


def _spy(monkeypatch, module, attr):
    calls = {"n": 0}
    real = getattr(module, attr)

    def wrapper(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(module, attr, wrapper)
    return calls


@pytest.mark.parametrize(
    "key,module_name,attr",
    [
        ("ann_pq", "stock_data_project_spark.operators.pq", "pq_fit"),
        ("ann_ivf", "stock_data_project_spark.operators.ivf", "ivf_fit"),
        (
            "bloom_join_prune",
            "stock_data_project_spark.operators.bloom",
            "_bloom_build_uncached",
        ),
    ],
)
def test_second_invocation_schedules_no_fit(
    arrow_off, monkeypatch, key, module_name, attr
):
    import importlib

    from stock_data_project_spark import plans

    spark = arrow_off
    module = importlib.import_module(module_name)
    calls = _spy(monkeypatch, module, attr)
    fn = plans.all_queries()[key]
    assert fn(spark, SF_SMOKE).count() > 0
    first = calls["n"]
    # an earlier test in the shared session may have warmed the memo
    # (first == 0) — the claim under test is NO NEW fit on re-invoke
    assert first <= 1
    assert fn(spark, SF_SMOKE).count() > 0
    assert calls["n"] == first, (
        f"{key}: re-invocation re-ran {attr} ({calls['n'] - first} extra "
        f"fit call(s)) — the session memo (operators/memo.py) regressed"
    )
