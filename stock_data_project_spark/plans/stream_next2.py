"""Streaming key built in r5 for the r6 driver window.

``stream_anomaly`` closes the monitoring loop the batch side already
grades (zscore_anomaly): the same z-score gate running on the live
engine against a static per-type profile — stream-static broadcast
join + watermarked hourly rollup (streaming/pipeline.py
stream_anomaly_counts has the scale notes). Registered immediately
(r5 rule); parity-proven by tests/test_next2_staged.py.
"""

from __future__ import annotations

from stock_data_project_spark.streaming.pipeline import (
    stream_anomaly_counts,
    stream_scd2_dim,
)

QUERIES_NEXT = {
    "stream_anomaly": stream_anomaly_counts,
    "stream_scd2": stream_scd2_dim,
}

# profile mean/std rounded 6dp on both sides; z reads the rounded
# profile; the verdict compares the ROUNDED z (engine-stable)
ORACLE_NEXT = {
    "stream_anomaly": """
        WITH profile AS (
            SELECT event_type,
                   round(avg(value), 6) AS p_mean,
                   round(stddev_samp(value), 6) AS p_std
            FROM events GROUP BY event_type
        )
        SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
               e.event_type,
               count(*) AS n_events,
               CAST(sum(CASE WHEN abs(round((e.value - p.p_mean)
                                            / nullif(p.p_std, 0.0), 6)) > 3.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM events e JOIN profile p USING (event_type)
        GROUP BY 1, 2
    """,
}

# the incremental maintainer's contract IS equality with the batch
# build, so its oracle is scd2_dim's own oracle verbatim
from stock_data_project_spark.plans.olap_next3 import (  # noqa: E402
    ORACLE_NEXT as _OLAP3_ORACLE,
)

ORACLE_NEXT["stream_scd2"] = _OLAP3_ORACLE["scd2_dim"]
