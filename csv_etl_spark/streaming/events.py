"""Structured Streaming ingest (SURVEY §2.7/§2.9 extension — the reference
is batch-only; the ``events`` test table exists for exactly this).

Patterns provided:
* read_events_stream — file-source stream over a directory of parquet
  events (schema locked; new files picked up incrementally).
* windowed_counts    — watermarked tumbling-window aggregation (late data
  beyond the watermark dropped, state bounded).
* sessionize         — session windows (gap-based) per user.
* stream_mapping     — the SAME compiled ETL mapping applied to a stream:
  the compiler emits pure Column expressions, so a mapping works unchanged
  under ``readStream`` (this is the payoff of compiling instead of
  interpreting).

All stateful operators carry watermarks so state is bounded — the
difference between "runs on the demo" and "runs for a month at 100 TB/day".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv_etl_spark.compiler import compile_mapping
from csv_etl_spark.specs import ETLMapping

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with a watermark: late
    rows beyond `watermark` are dropped and window state is evicted —
    bounded state regardless of stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-cast sum: exact & order-independent (matches any
            # single-threaded oracle bit-for-bit; plain double sums don't)
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: events closer than `gap` merge into one
    session.  Uses the built-in session_window (no custom state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-cast sum: exact & order-independent (matches any
            # single-threaded oracle bit-for-bit; plain double sums don't)
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            F.col("user_id"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def stream_mapping(events: DataFrame, mapping: ETLMapping | dict) -> DataFrame:
    """Apply a compiled ETL mapping to a (string-typed view of a) stream.
    Identical semantics to the batch path — same compiled expressions."""
    as_strings = events.select(*[F.col(c).cast("string").alias(c) for c in events.columns])
    compiled = compile_mapping(mapping, as_strings.columns)
    return compiled.apply(as_strings, with_errors=True)
