"""Sinks: partitioned parquet + object-store configuration.

The reference's sink is parquet-on-MinIO via DuckDB httpfs
(fetch_stocks.py:243-266). Spark's equivalent is s3a:// paths; the
helper sets the MinIO-style config (path-style, no SSL). Jars for
hadoop-aws aren't in this container, so the helper only sets conf —
callers on a real cluster get working s3a for free, local callers
keep using file paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    ssl: bool = False,
) -> None:
    """MinIO-compatible s3a settings (path-style addressing)."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.access.key", access_key)
    hc.set("fs.s3a.secret.key", secret_key)
    hc.set("fs.s3a.path.style.access", "true")
    hc.set("fs.s3a.connection.ssl.enabled", "true" if ssl else "false")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Partitioned parquet write. ``maxRecordsPerFile`` caps file size
    so a skewed partition value can't produce a multi-GB file; at
    100 TB pair this with a repartition on the partition columns so
    each task writes few files (avoids the many-small-files problem).
    """
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
