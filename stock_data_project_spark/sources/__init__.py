"""Readers/writers: schema-explicit ingestion and partitioned sinks.

The reference ingests CSV from MinIO (S3 API) and writes parquet back
(fetch_stocks.py:72-78, 243-266). Here the same surface is expressed
as Spark sources/sinks: explicit-schema CSV/JSON readers (never
inferSchema in production — a full extra pass at 100 TB), partitioned
parquet writes, and an s3a configuration helper for MinIO-compatible
object stores (jars permitting; config is inert locally).
"""

from stock_data_project_spark.sources.readers import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    stocks_csv_schema,
)
from stock_data_project_spark.sources.writers import (
    compact_parquet,
    configure_s3a,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "stocks_csv_schema",
    "compact_parquet",
    "configure_s3a",
    "write_bucketed",
    "write_partitioned",
]
