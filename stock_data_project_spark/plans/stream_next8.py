"""Streaming key built in r9, staged for the r11 window.

``stream_left_join`` — stream-stream LEFT OUTER interval join in
append mode: every view joined to the same user's clicks within
[view_ts, view_ts + 30 min], both sides watermarked 1 hour. The new
semantic this key grades (beyond stream_interval_join's inner
variant) is OUTER-NULL EMISSION: an unmatched view emits a
null-extended row only once the engine can prove no future click can
match it — i.e. when the global watermark passes view_ts + 30 min —
and views still inside the horizon when the stream ends are WITHHELD
(never emitted), which is exactly what a production job restarted
from a checkpoint would still owe.

Engine semantics replayed by the oracle (pinned empirically at
sf0.01, one row off until each was modeled):
- the global watermark is the MIN across BOTH watermark operators,
  each computed over its own POST-FILTER side: min(max view_ts,
  max click_ts) − delay. An oracle using the overall events max is
  wrong whenever the two types' maxima differ (they do here).
- Spark tracks event-time stats in MILLISECONDS: the watermark is
  floor(max_us/1000)·1000 − delay. The oracle replicates the
  truncation in integer µs arithmetic.
- eviction/emission uses strict ``expiry < watermark``; a tie needs
  the view's µs-offset to land exactly on the ms-truncated minimum —
  measure-zero on data with µs jitter (the stream_late_data
  tie-absence argument), asserted absent in the staged tests.

The file source delivers one micro-batch; matched pairs emit there
(equal to the batch inner join) and the trailing no-data batch emits
the null-extended rows at the final watermark. State is bounded by
one watermark+interval horizon per side — the production shape for
unbounded sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SLJ_INTERVAL_US = 1800 * 1000000
_SLJ_DELAY_US = 3600 * 1000000


def stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_project_spark.streaming.pipeline import (
        _run_to_memory,
        read_events_stream,
    )

    ev = read_events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND click_ts >= view_ts "
            "AND click_ts <= view_ts + interval 30 minutes"
        ),
        "leftOuter",
    ).select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "click_ts",
    )
    _run_to_memory(joined, "stream_left_join", "append")
    return spark.table("stream_left_join")


QUERIES_NEXT = {"stream_left_join": stream_left_join}

ORACLE_NEXT = {
    # module doc: min-of-sides ms-truncated watermark; strict <
    # eviction; epoch_us comparisons throughout (never epoch()).
    "stream_left_join": f"""
        WITH fwm AS (
            SELECT least(
                (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                 WHERE event_type = 'view'),
                (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                 WHERE event_type = 'click')
            ) - CAST({_SLJ_DELAY_US} AS BIGINT) AS wm
        ),
        matched AS (
            SELECT v.event_id AS view_id, c.event_id AS click_id,
                   v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
            FROM events v JOIN events c
              ON v.user_id = c.user_id
             AND epoch_us(c.ts) >= epoch_us(v.ts)
             AND epoch_us(c.ts) <= epoch_us(v.ts) + {_SLJ_INTERVAL_US}
            WHERE v.event_type = 'view' AND c.event_type = 'click'
        ),
        unmatched AS (
            SELECT v.event_id AS view_id, NULL AS click_id,
                   v.user_id AS user_id, v.ts AS view_ts,
                   CAST(NULL AS TIMESTAMP) AS click_ts
            FROM events v, fwm
            WHERE v.event_type = 'view'
              AND v.event_id NOT IN (SELECT view_id FROM matched)
              AND epoch_us(v.ts) + {_SLJ_INTERVAL_US} < fwm.wm
        )
        SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
}
