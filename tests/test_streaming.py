"""Structured Streaming tests: file-source ingest with availableNow trigger,
watermarked windows, sessions, and a compiled mapping running on a stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_etl_spark.sources.tables import load_events
from csv_etl_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    sessionize,
    stream_mapping,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Copy sf0.001 events into a streaming source dir (normalizing the
    driver's TIMESTAMP(NANOS) parquet to micro precision on the way)."""
    d = str(tmp_path / "events_in")
    load_events(spark, SF).coalesce(2).write.parquet(d)
    return d


def _run_stream(spark, sdf, name: str, mode: str = "complete"):
    # "complete" for aggregations; projections (no state) must use "append"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_stream(spark, windowed_counts(stream), "win_counts")

    batch = windowed_counts(spark.read.schema(EVENTS_SCHEMA).parquet(events_dir))
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in out.collect()}
    exp = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in batch.collect()}
    assert got == exp and len(got) > 0


def test_sessionize_stream_runs(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = _run_stream(spark, sessionize(stream, gap="30 minutes"), "sessions")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_compiled_mapping_on_stream(spark, events_dir):
    """The SAME mapping JSON drives batch and streaming — compiler payoff."""
    mapping = {
        "id": "m", "name": "m",
        "filter_rules": [{"field": "event_type", "operator": "equals", "value": "error"}],
        "field_mappings": [
            {"destination_field": "event_id", "source_field": "event_id",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "category", "source_field": "event_type",
             "transform_type": "lookup",
             "transform_config": {"click": "engagement", "view": "engagement",
                                  "_default": "other"}},
        ],
    }
    stream = read_events_stream(spark, events_dir)
    out = _run_stream(spark, stream_mapping(stream, mapping), "mapped", mode="append")
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"event_id", "category", "_errors"}
    cats = {r["category"] for r in rows}
    assert cats.issubset({"engagement", "other"})

    # batch equivalence on the same data: same mapping, same row count
    batch_df = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    assert stream_mapping(batch_df, mapping).count() == len(rows)
