"""Table catalog over a testdata scale-factor directory.

The reference reads its tables ad-hoc from MinIO via DuckDB httpfs
(fetch_stocks.py:152-161); here a small registry maps logical table
names to parquet paths with explicit schemas, so every plan gets
column pruning + predicate pushdown from the scan and no sampling
passes for schema inference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def convert_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Shared nanos->timestamp conversion (batch + streaming read
    paths): integer division keeps int64 nanos exact; a float path
    would corrupt values past 2^53."""
    if dict(df.dtypes).get(col) == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet carries the schema; Catalyst prunes.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    has no native type for — it's read via the ``nanosAsLong`` legacy
    conf and converted to a microsecond timestamp with integer
    division (the testdata is µs-aligned, so this is lossless; a
    float path would corrupt int64 nanos past 2^53).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Date/window results must be reproducible against a UTC-naive
    # DuckDB oracle regardless of the caller's session defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return convert_nanos_ts(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API. Skips the
    work (10 parquet footer reads) when this session already has views
    for the same sf_dir."""
    marker = "spark.stock_data_project.registered_sf_dir"
    try:
        if spark.conf.get(marker) == sf_dir:
            return
    except Exception:
        pass
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.conf.set(marker, sf_dir)
