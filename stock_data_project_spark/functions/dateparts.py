"""Calendar attribute expressions for the date dimension.

Mirrors the reference's DimDate derivation (fetch_stocks.py:165-184):
year, month, day-of-week, weekend flag. ``dow`` is normalized to
0=Sunday..6=Saturday (the reference's ``strftime('%w')`` convention)
so a DuckDB ``date_part('dow', ...)`` oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dow(date_col: Column | str) -> Column:
    """0=Sunday .. 6=Saturday (Spark's dayofweek is 1-based)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.dayofweek(c) - F.lit(1)).cast("int")


def is_weekend(date_col: Column | str) -> Column:
    return dow(date_col).isin(0, 6)
