"""Loaders for the driver's parquet test tables.

The only quirk lives in ``events.parquet``: the driver wrote it with
nanosecond-precision timestamps (parquet logical type TIMESTAMP(NANOS)),
which Spark's parquet reader rejects outright by default
(PARQUET_TYPE_ILLEGAL).  ``load_events`` reads nanos as raw int64
(``spark.sql.legacy.parquet.nanosAsLong``), integer-divides to
microseconds (exact — float division would lose precision at 1e18), and
rebuilds a proper TimestampType column.  DuckDB reads the same file
natively with micro truncation, so both engines see identical instants.

At 100 TB this is a one-time normalization step you'd run at ingest and
never again; keeping it in a single loader means every operator downstream
sees clean micro-precision timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver test table (``{sf_dir}/{name}.parquet``)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events loader tolerant of TIMESTAMP(NANOS) parquet."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw
