"""Schema-explicit readers.

``stocks_csv_schema`` mirrors the reference's ingest file layout
(fetch_stocks.py:69-70: Date,Ticker,Open,High,Low,Close,Adj Close,
Volume) so a user of the reference can point this engine at the same
CSV drops.

Migration note: the reference names its drops ``stocks:{date}.csv``
(fetch_stocks.py:72). The colon is a URI scheme separator to Hadoop
Path, so those objects must be renamed (e.g. ``stocks_{date}.csv``)
when moving to any HDFS-compatible filesystem, s3a included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stocks_csv_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("Date", T.DateType()),
            T.StructField("Ticker", T.StringType()),
            T.StructField("Open", T.DoubleType()),
            T.StructField("High", T.DoubleType()),
            T.StructField("Low", T.DoubleType()),
            T.StructField("Close", T.DoubleType()),
            T.StructField("Adj Close", T.DoubleType()),
            T.StructField("Volume", T.DoubleType()),
        ]
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV with a mandatory schema: no inference pass, bad rows to a
    corrupt-record column instead of silent nulls."""
    if "_corrupt_record" not in schema.fieldNames():
        schema = T.StructType(
            list(schema) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (native vectorized reader). Like parquet, ORC files
    carry their schema and support predicate pushdown + column
    pruning; prefer it only when the surrounding ecosystem already
    speaks ORC (Hive-era warehouses) — the engine's own sinks stay
    parquet."""
    return spark.read.orc(path)
