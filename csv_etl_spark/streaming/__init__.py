from csv_etl_spark.streaming.events import (
    read_events_stream,
    sessionize,
    stream_mapping,
    windowed_counts,
)

__all__ = ["read_events_stream", "windowed_counts", "sessionize", "stream_mapping"]
