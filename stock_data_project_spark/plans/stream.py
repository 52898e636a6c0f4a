"""Structured Streaming plans surfaced through the driver contract.

Each runs a real streaming query (file source -> watermark ->
windowed aggregation -> memory sink) to completion on the bounded
testdata, then returns the sink contents — so the correctness gate
exercises the actual streaming engine, not a batch stand-in.
"""

from __future__ import annotations

from stock_data_project_spark.streaming.pipeline import (
    stream_dedup_counts,
    stream_enrich_counts,
    stream_running_stats,
    stream_sessionize,
    stream_window_counts,
)


QUERIES = {
    "stream_window_counts": stream_window_counts,
    "stream_sessionize": stream_sessionize,
    "stream_running_stats": stream_running_stats,
    "stream_dedup": stream_dedup_counts,
    "stream_enrich": stream_enrich_counts,
}

ORACLE = {
    "stream_dedup": """
        SELECT event_type, count(DISTINCT event_id) AS n
        FROM events GROUP BY event_type
    """,
    "stream_enrich": """
        SELECT c_mktsegment, count(*) AS n, round(sum(value), 6) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "stream_window_counts": """
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
               event_type, count(*) AS n, round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # session_window(gap 30min): window = [min ts, max ts + 30min);
    # an event at EXACTLY the previous session's end still merges
    # (verified empirically), so a new session starts only when the
    # inter-event gap is STRICTLY greater than the gap duration.
    "stream_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS session_value
        FROM sess GROUP BY user_id, session_seq
    """,
}
