"""Streaming key built in r10, staged for the r12 window.

``stream_full_join`` — stream-stream FULL OUTER interval join in
append mode: views joined to same-user clicks within [view_ts,
view_ts + 30 min], both sides watermarked 1 hour. Beyond
stream_left_join's left-outer emission, this grades the remaining
emission semantics: BOTH sides emit null-extended rows on watermark
expiry —

- an unmatched VIEW emits once the global watermark passes
  view_ts + 30 min (no future click can land in its interval) — the
  stream_left_join recurrence, unchanged;
- an unmatched CLICK emits once the global watermark passes click_ts
  itself: the interval condition bounds a matching view by
  view_ts <= click_ts, and a view older than the watermark can no
  longer arrive, so the click's match horizon closes at its own
  timestamp (the state-watermark Spark derives from
  ``click_ts >= view_ts``).

Engine semantics replayed by the oracle (the stream_left_join pins,
extended to the right side and re-pinned empirically at sf0.001 and
sf0.01 — one row off until the click-side inequality was modeled):
- global watermark = min across BOTH sides' post-filter maxima:
  min(max view_ts, max click_ts) ms-truncated, − delay (integer µs
  arithmetic).
- view-side emission: strict ``view_ts + 30 min < wm``; click-side
  emission: strict ``click_ts < wm``. Ties need a µs-offset landing
  exactly on the ms-truncated minimum — measure-zero on µs-jittered
  data, asserted absent in the staged tests.
- rows still inside their horizon when the stream ends are WITHHELD
  on both sides (what a checkpoint-restarted job still owes).

State is bounded by one watermark+interval horizon per side — the
production shape for unbounded sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SFJ_INTERVAL_US = 1800 * 1000000
_SFJ_DELAY_US = 3600 * 1000000


def stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "fullOuter",
    ).select(
        "view_id",
        "click_id",
        F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
        "view_ts",
        "click_ts",
    )
    _run_to_memory(joined, "stream_full_join", "append")
    return spark.table("stream_full_join")


QUERIES_NEXT = {"stream_full_join": stream_full_join}

ORACLE_NEXT = {
    # module doc: min-of-sides ms-truncated watermark; strict <
    # eviction on both sides (view horizon view_ts+30min, click
    # horizon click_ts); epoch_us comparisons throughout.
    "stream_full_join": f"""
        WITH fwm AS (
            SELECT least(
                (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                 WHERE event_type = 'view'),
                (SELECT (max(epoch_us(ts)) // 1000) * 1000 FROM events
                 WHERE event_type = 'click')
            ) - CAST({_SFJ_DELAY_US} AS BIGINT) AS wm
        ),
        matched AS (
            SELECT v.event_id AS view_id, c.event_id AS click_id,
                   v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
            FROM events v JOIN events c
              ON v.user_id = c.user_id
             AND epoch_us(c.ts) >= epoch_us(v.ts)
             AND epoch_us(c.ts) <= epoch_us(v.ts) + {_SFJ_INTERVAL_US}
            WHERE v.event_type = 'view' AND c.event_type = 'click'
        ),
        unmatched_views AS (
            SELECT v.event_id AS view_id, NULL AS click_id,
                   v.user_id AS user_id, v.ts AS view_ts,
                   CAST(NULL AS TIMESTAMP) AS click_ts
            FROM events v, fwm
            WHERE v.event_type = 'view'
              AND v.event_id NOT IN (SELECT view_id FROM matched)
              AND epoch_us(v.ts) + {_SFJ_INTERVAL_US} < fwm.wm
        ),
        unmatched_clicks AS (
            SELECT NULL AS view_id, c.event_id AS click_id,
                   c.user_id AS user_id,
                   CAST(NULL AS TIMESTAMP) AS view_ts, c.ts AS click_ts
            FROM events c, fwm
            WHERE c.event_type = 'click'
              AND c.event_id NOT IN (SELECT click_id FROM matched)
              AND epoch_us(c.ts) < fwm.wm
        )
        SELECT * FROM matched
        UNION ALL SELECT * FROM unmatched_views
        UNION ALL SELECT * FROM unmatched_clicks
    """,
}
