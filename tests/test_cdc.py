"""snapshot_diff / apply_diff: kinds, NULL keys/values, round-trip
inverse property, and the one-join plan shape."""

from __future__ import annotations

from stock_data_project_spark.operators.cdc import apply_diff, snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, v double")


def test_diff_kinds(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _df(spark, [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)])
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["change_kind"] == "delete" and out[1]["v"] == 1.0
    assert out[3]["change_kind"] == "update" and out[3]["v"] == 9.0
    assert out[4]["change_kind"] == "insert" and out[4]["v"] == 4.0


def test_diff_null_values_and_keys(spark):
    old = _df(spark, [(1, None, 1.0), (None, "x", 5.0)])
    new = _df(spark, [(1, None, 1.0), (None, "x", 6.0)])
    out = snapshot_diff(old, new, ["k"]).collect()
    # NULL seg unchanged -> no row; NULL key matches via eqNullSafe
    assert len(out) == 1
    assert out[0]["k"] is None and out[0]["change_kind"] == "update"
    assert out[0]["v"] == 6.0


def test_apply_diff_is_inverse(spark):
    old = _df(spark, [(i, "s" + str(i % 3), float(i)) for i in range(50)])
    new = _df(
        spark,
        [(i, "s" + str(i % 3), float(i if i % 7 else -i)) for i in range(5, 60)],
    )
    diff = snapshot_diff(old, new, ["k"])
    replayed = apply_diff(old, diff, ["k"])
    a = sorted(map(tuple, replayed.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b


def test_diff_schema_mismatch_raises(spark):
    import pytest

    old = _df(spark, [(1, "a", 1.0)])
    new = old.withColumnRenamed("v", "w")
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_diff(old, new, ["k"])


def test_diff_plan_single_join(spark):
    old = _df(spark, [(1, "a", 1.0)])
    new = _df(spark, [(1, "a", 2.0)])
    plan = (
        snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") <= 2  # one logical full-outer join
    assert "CartesianProduct" not in plan
