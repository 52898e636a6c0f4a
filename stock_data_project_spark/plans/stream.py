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
    stream_ingest_dedup_counts,
    stream_interval_join,
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
    "stream_interval_join": stream_interval_join,
    "stream_ingest_dedup": stream_ingest_dedup_counts,
}

ORACLE = {
    # epoch_us on both engines: DuckDB's TIMESTAMP_NS truncates to µs
    # exactly like Spark's nanos-div-1000 read path
    "stream_interval_join": """
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND epoch_us(c.ts) >= epoch_us(v.ts)
         AND epoch_us(c.ts) <= epoch_us(v.ts) + 1800 * 1000000
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    # Semantics caveat: the streaming side dedups ids recurring
    # WITHIN the 1-hour watermark and keeps the FIRST row's
    # event_type; this oracle counts DISTINCT event_id globally per
    # type. The two agree on this testdata (event_ids are unique) but
    # diverge if an id replays later than the watermark or recurs
    # under a different event_type — keep-first-within-watermark is
    # the intended production semantic, the oracle is its bounded
    # unique-id specialization.
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

# The streaming ingest gate's pure observable: epoch e admits exactly
# the content fingerprints whose FIRST drop (doc_id % 3, processed in
# order) is e — within-batch collapse + anti join vs committed history
# reduce to min(epoch) per fingerprint. NULL text is excluded like
# every exact-dedup path (absent content is not duplicate content).
ORACLE["stream_ingest_dedup"] = r"""
    WITH fp AS (
        SELECT CAST(doc_id % 3 AS INT) AS epoch,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        FROM documents WHERE text IS NOT NULL
    ),
    firsts AS (
        SELECT h, min(epoch) AS epoch FROM fp GROUP BY h
    )
    SELECT epoch, count(*) AS n_admitted FROM firsts GROUP BY epoch
"""

# r5 graduation: stream_ohlc_bars + stream_topk join the graded
# inventory. Implementations and oracles stay in stream_next.py.
from stock_data_project_spark.plans.stream_next import (  # noqa: E402
    ORACLE_NEXT,
    QUERIES_NEXT,
)

QUERIES.update(QUERIES_NEXT)
ORACLE.update(ORACLE_NEXT)

# r5 build, r6 debut: stream_anomaly
from stock_data_project_spark.plans.stream_next2 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT2,
    QUERIES_NEXT as QUERIES_NEXT2,
)

QUERIES.update(QUERIES_NEXT2)
ORACLE.update(ORACLE_NEXT2)

# r6 build, r7 debut: stream_quantile (bounded-state streaming
# histogram sketch, oracled with quantile_rollup's own oracle)
from stock_data_project_spark.plans.stream_next3 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT3,
    QUERIES_NEXT as QUERIES_NEXT3,
)

QUERIES.update(QUERIES_NEXT3)
ORACLE.update(ORACLE_NEXT3)

# r7 build, r8 debut: stream_late_data (finalized append-sink window
# counts with late rows excluded — the numRowsDroppedByWatermark
# progress metric is partial-layout-dependent, hence NOT graded;
# oracle replays the watermark recurrence over the same arrival order)
from stock_data_project_spark.plans.stream_next4 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT4,
    QUERIES_NEXT as QUERIES_NEXT4,
)

QUERIES.update(QUERIES_NEXT4)
ORACLE.update(ORACLE_NEXT4)

# r8 build, r9 debut: stream_distinct_users (chained stateful
# dedup -> windowed count; in-order feed leaves one recurrence —
# the final-watermark emission cut — for the oracle to replay)
from stock_data_project_spark.plans.stream_next5 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT5,
    QUERIES_NEXT as QUERIES_NEXT5,
)

QUERIES.update(QUERIES_NEXT5)
ORACLE.update(ORACLE_NEXT5)

# r8 build (late batch), r9 debut: stream_sliding_avg (hopping-window
# agg with decimal state + exact-integer HALF_UP average) and
# stream_funnel_state (applyInPandasWithState stage machine whose
# strict-> advance rule equals the SQL min-ts chain — fully oracled)
from stock_data_project_spark.plans.stream_next6 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT6,
    QUERIES_NEXT as QUERIES_NEXT6,
)

QUERIES.update(QUERIES_NEXT6)
ORACLE.update(ORACLE_NEXT6)

# r9 build, r10 debut: stream_dedup_watermark — bounded-state
# streaming dedup via dropDuplicatesWithinWatermark, probe-pinned
# engine semantics (late gate first, no expiry extension, eviction at
# expireAt ≤ wm) collapsed to a DISTINCT-on-time oracle
from stock_data_project_spark.plans.stream_next7 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT7,
    QUERIES_NEXT as QUERIES_NEXT7,
)

QUERIES.update(QUERIES_NEXT7)
ORACLE.update(ORACLE_NEXT7)

# r9 build, r11 debut: stream-stream LEFT OUTER interval join —
# outer-null emission at the min-of-sides ms-truncated watermark
from stock_data_project_spark.plans.stream_next8 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT8,
    QUERIES_NEXT as QUERIES_NEXT8,
)

QUERIES.update(QUERIES_NEXT8)
ORACLE.update(ORACLE_NEXT8)

# r10 build, r12 debut: stream-stream FULL OUTER interval join —
# null-extended emission on BOTH sides' watermark expiry (view
# horizon view_ts+30min, click horizon click_ts, each strict <)
from stock_data_project_spark.plans.stream_next9 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT9,
    QUERIES_NEXT as QUERIES_NEXT9,
)

QUERIES.update(QUERIES_NEXT9)
ORACLE.update(ORACLE_NEXT9)

# r10 late build, r12 debut: chained stateful aggregations (5-min
# buckets rolled up hourly inside ONE streaming query, SPARK-40925)
from stock_data_project_spark.plans.stream_next10 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT10,
    QUERIES_NEXT as QUERIES_NEXT10,
)

QUERIES.update(QUERIES_NEXT10)
ORACLE.update(ORACLE_NEXT10)

# r11 build, r12 debut: the incremental-star upsert graded — the
# real foreachBatch pipeline run to completion, committed fact table
# returned and oracled against the batch daily-bars SQL
from stock_data_project_spark.plans.stream_next11 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT11,
    QUERIES_NEXT as QUERIES_NEXT11,
)

QUERIES.update(QUERIES_NEXT11)
ORACLE.update(ORACLE_NEXT11)

# r13 build, r14 debut: the streaming NEAR-dup ingest gate — the
# banded-LSH twin of stream_ingest_dedup's exact gate, fully oracled
# via engine-neutral md5-derived MinHash
from stock_data_project_spark.plans.stream_next12 import (  # noqa: E402
    ORACLE_NEXT as ORACLE_NEXT12,
    QUERIES_NEXT as QUERIES_NEXT12,
)

QUERIES.update(QUERIES_NEXT12)
ORACLE.update(ORACLE_NEXT12)
