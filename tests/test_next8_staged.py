"""r9-built streaming key staged for the r10 window
(stream_next7.stream_dedup_watermark): driver-identical parity plus
the operator's reason-to-exist — the BOUNDED state — asserted from
the progress metrics (in-repo only; state metrics are partial-layout-
dependent and never graded), and the watermark-tie absence the
119-minute delay choice relies on."""

from __future__ import annotations

import pytest

from stock_data_project_spark.plans import stream_next7
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_key_is_oracled():
    assert set(stream_next7.QUERIES_NEXT) == set(stream_next7.ORACLE_NEXT)


def test_dedup_watermark_parity(spark):
    df = stream_next7.stream_dedup_watermark(spark, SF_ORACLE)
    assert_gradable_schema(df, "stream_dedup_watermark")
    assert df.count() > 0
    compare(
        df, duckdb_run(stream_next7.ORACLE_NEXT["stream_dedup_watermark"], SF_ORACLE)
    )


def test_dedup_watermark_state_is_bounded_and_late_gate_fires(spark):
    """The point of dropDuplicatesWithinWatermark over dropDuplicates:
    state holds only the ids of one delay horizon, not every id ever
    seen. The final no-data batch's state must be a small fraction of
    the admitted ids, and the late gate must actually have discarded
    replayed rows."""
    rows, progress = stream_next7.run_dedup_watermark(
        spark, SF_SMOKE, query_name="sdw_state_probe"
    )
    states = [
        p["stateOperators"][0]
        for p in progress
        if p.get("stateOperators")
    ]
    assert states, "no state metrics captured"
    final_state = states[-1]["numRowsTotal"]
    dropped_late = sum(s.get("numRowsDroppedByWatermark", 0) for s in states)
    n_admitted = len(rows)
    assert n_admitted > 0
    # events span ~30 days vs a ~2h eviction horizon (ids stay in
    # state until wm > ts + delay, i.e. roughly the last 2·delay of
    # event time at the final cut)
    assert final_state < 0.2 * n_admitted, (final_state, n_admitted)
    assert dropped_late > 0
    # every admitted id exactly once (the exactly-once-ingest claim)
    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids))


def test_dedup_watermark_no_watermark_ties(spark):
    """The oracle assumes ties (arrival ts == batch-entry watermark)
    never occur: a tie needs an exact 7,140.000000 s gap to a prior
    drop's max ts. Assert absence on the actual arrival feed."""
    import duckdb

    for sf in (SF_SMOKE, SF_ORACLE):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        (n_ties,) = con.sql(
            f"""
            WITH params AS (SELECT max(event_id) + 1 AS n FROM events),
            thirds AS (
                SELECT event_id, ts,
                       CASE WHEN event_id < n // 3 THEN 0
                            WHEN event_id < 2 * n // 3 THEN 1
                            ELSE 2 END AS drop_id
                FROM events, params
            ),
            wm AS (
                SELECT drop_id,
                       max(max(ts) - INTERVAL 119 MINUTE) OVER (
                           ORDER BY drop_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS wm_prev
                FROM thirds GROUP BY drop_id
            )
            SELECT count(*) FROM thirds t JOIN wm USING (drop_id)
            WHERE t.ts = wm.wm_prev
            """
        ).fetchone()
        assert n_ties == 0, (sf, n_ties)
