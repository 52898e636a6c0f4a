"""Reference-format ingestion: the migration path for a user of the
reference project.

The reference stores daily OHLCV rows fetched from Yahoo Finance as
CSV (``Date,Ticker,Open,High,Low,Close,Adj Close,Volume`` —
fetch_stocks.py:69-70). ``bars_from_stocks_csv`` adapts that layout
straight into this engine's canonical daily-bar schema, so every
downstream operator (returns, volatility, star build, dashboards)
runs unchanged on the reference's own data drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_project_spark.operators.returns import with_daily_return
from stock_data_project_spark.operators.volatility import with_rolling_volatility


def bars_from_stocks_csv(stocks: DataFrame, price_col: str = "Close") -> DataFrame:
    """Reference stocks CSV rows -> canonical daily bars
    (series_key, date, open, high, low, close, volume, turnover).

    The source is already daily-resolution, so no resample happens.
    ``close`` comes from ``price_col`` — default ``Close``, matching
    the reference (it computes returns on Close, fetch_stocks.py:213);
    pass ``"Adj Close"`` for split/dividend-adjusted analytics."""
    return stocks.select(
        F.col("Ticker").alias("series_key"),
        F.col("Date").cast("timestamp").alias("date"),
        F.col("Open").alias("open"),
        F.col("High").alias("high"),
        F.col("Low").alias("low"),
        F.col(price_col).alias("close"),
        F.col("Volume").cast("long").alias("volume"),
        F.round(F.col(price_col) * F.col("Volume"), 6).alias("turnover"),
    )


def stocks_csv_to_fact(stocks: DataFrame) -> DataFrame:
    """The reference's full derived-metric pipeline on its own CSV:
    daily return + 20-day rolling volatility per ticker
    (fetch_stocks.py:213-216)."""
    bars = bars_from_stocks_csv(stocks)
    bars = with_daily_return(bars)
    return with_rolling_volatility(bars, window=20)
