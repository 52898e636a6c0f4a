"""Spark-SQL-API plans: the engine's SQL surface.

The reference's whole transform layer is SQL strings against DuckDB
(fetch_stocks.py:165-241); these plans run through
``catalog.register_views`` + ``spark.sql`` to prove the same text
interface works here — Catalyst produces the same physical plans as
the DataFrame API, so this is a surface guarantee, not a separate
engine path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stock_data_project_spark.catalog import register_views


def q_sql_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment and order year, in pure SQL."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               year(o_orderdate) AS order_year,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, year(o_orderdate)
        """
    )


def q_sql_star_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Streamlit chart query (app.py:90, 106-110) in SQL over the
    star views: per-day close for one series with calendar attrs."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT date, close, year(date) AS year, month(date) AS month
        FROM (
            SELECT date_trunc('day', ts) AS date, max_by(value, ts) AS close
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY date_trunc('day', ts)
        )
        ORDER BY date
        """
    )


def q_sql_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average (the
    subquery becomes a broadcast scalar in the plan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


QUERIES = {
    "sql_segment_revenue": q_sql_segment_revenue,
    "sql_star_query": q_sql_star_query,
    "sql_above_avg_orders": q_sql_above_avg_orders,
}

ORACLE = {
    "sql_above_avg_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
    "sql_segment_revenue": """
        SELECT c_mktsegment,
               CAST(year(o_orderdate) AS INT) AS order_year,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, year(o_orderdate)
    """,
    "sql_star_query": """
        SELECT date, close,
               CAST(year(date) AS INT) AS year,
               CAST(month(date) AS INT) AS month
        FROM (
            SELECT date_trunc('day', ts) AS date, max_by(value, ts) AS close
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY date_trunc('day', ts)
        )
        ORDER BY date
    """,
}
