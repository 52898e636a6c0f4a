"""OLAP information-theoretic key built late in r10, staged for the
r12 window.

``event_mutual_info`` — mutual information (and normalized MI)
between event type and hour-of-day over the events stream: the
information-theoretic dependence audit that complements
categorical_association's chi-square (MI measures the dependence in
nats; chi-square tests it). I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))),
H(X) = ln N − Σ c_x·ln(c_x)/N, NMI = I/min(H(X), H(Y)).

Cross-engine exactness: all counts are exact BIGINTs from one cell
aggregation (marginals via windows over the 120-cell table, never a
second scan); each per-cell log-ratio ln((c_xy·N)/(c_x·c_y)) and each
marginal ln(c) is a double over EXACT integers with the identical
expression shape, rounded HALF-even to 6dp and cast to DECIMAL(12,6)
(the unigram_logprob / dsir libm-absorption precedent); the Σ c·w
reductions are exact DECIMAL sums — order-independent — and only the
final /N division runs in shared-shape double. Hour-of-day is pure
epoch arithmetic (epoch_us div 3600e6 mod 24), immune to the engines'
timezone/extract disagreements (the seasonal_decompose dow rule).

Scale shape: ONE events scan → (type, hour) hash agg with map-side
partials (120 cells at any corpus size); marginals/totals are windows
over the cell table (metadata-sized); output is a single row. At
100 TB the scan dominates and the cell table is still 120 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table

# shared double-expression strings (identical text both engines)
_MI = "(CAST(wsum AS DOUBLE) / CAST(n_events AS DOUBLE))"
_HX = "(ln(CAST(n_events AS DOUBLE)) - CAST(hx_sum AS DOUBLE) / n_events)"
_HY = "(ln(CAST(n_events AS DOUBLE)) - CAST(hy_sum AS DOUBLE) / n_events)"
_NMI = f"({_MI} / nullif(least({_HX}, {_HY}), 0.0))"


def q_event_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("x"),
        F.expr("CAST((unix_micros(ts) div 3600000000) % 24 AS INT)").alias("y"),
    )
    # cells (≤ |event_types|·24 rows) feeds the MI sum and both
    # marginal-entropy rollups — one eager materialization instead of
    # three events scans (r13 before-plan, 6 scans); metadata-sized
    cells = ev.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    scored = (
        cells.withColumn("cx", F.sum("c").over(wx))
        .withColumn("cy", F.sum("c").over(wy))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn(
            "w",
            F.expr(
                "CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)"
                " / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6)"
                " AS DECIMAL(12,6))"
            ),
        )
    )
    mi = scored.groupBy().agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        # Spark keeps narrow operands ((12,0)×(12,6) → (25,6)) so the
        # precision-38 cap never threatens the scale; the oracle uses
        # ≥19-digit operands for DuckDB's int128 tier — widths differ,
        # VALUES exact (the acf_returns width note)
        F.sum(F.expr("CAST(c AS DECIMAL(12,0)) * CAST(w AS DECIMAL(12,6))")).alias(
            "wsum"
        ),
    )
    hx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(cx AS DECIMAL(12,0))"
                    " * CAST(round(ln(CAST(cx AS DOUBLE)), 6) AS DECIMAL(12,6))"
                )
            ).alias("hx_sum")
        )
    )
    hy = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(cy AS DECIMAL(12,0))"
                    " * CAST(round(ln(CAST(cy AS DOUBLE)), 6) AS DECIMAL(12,6))"
                )
            ).alias("hy_sum")
        )
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n_events",
            "n_cells",
            (F.round(F.expr(_MI), 6) + 0.0).alias("mi_nats"),
            (F.round(F.expr(_HX), 6) + 0.0).alias("h_type"),
            (F.round(F.expr(_HY), 6) + 0.0).alias("h_hour"),
            (F.round(F.expr(_NMI), 6) + 0.0).alias("nmi"),
        )
    )


QUERIES_NEXT = {
    "event_mutual_info": q_event_mutual_info,
}

ORACLE_NEXT = {
    "event_mutual_info": f"""
        WITH ev AS (
            SELECT event_type AS x,
                   CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS y
            FROM events
        ),
        cells AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS c
            FROM ev GROUP BY 1, 2
        ),
        scored AS (
            SELECT c,
                   sum(c) OVER (PARTITION BY x) AS cx,
                   sum(c) OVER (PARTITION BY y) AS cy,
                   sum(c) OVER () AS n
            FROM cells
        ),
        mi AS (
            SELECT CAST(max(n) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_cells,
                   sum(CAST(c AS DECIMAL(19,0)) *
                       CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                            / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6)
                            AS DECIMAL(19,6))) AS wsum
            FROM scored
        ),
        hx AS (
            SELECT sum(CAST(cx AS DECIMAL(19,0)) *
                       CAST(round(ln(CAST(cx AS DOUBLE)), 6) AS DECIMAL(19,6)))
                       AS hx_sum
            FROM (SELECT CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY x)
        ),
        hy AS (
            SELECT sum(CAST(cy AS DECIMAL(19,0)) *
                       CAST(round(ln(CAST(cy AS DOUBLE)), 6) AS DECIMAL(19,6)))
                       AS hy_sum
            FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY y)
        )
        SELECT n_events, n_cells,
               round({_MI}, 6) + 0.0 AS mi_nats,
               round({_HX}, 6) + 0.0 AS h_type,
               round({_HY}, 6) + 0.0 AS h_hour,
               round({_NMI}, 6) + 0.0 AS nmi
        FROM mi, hx, hy
    """,
}
