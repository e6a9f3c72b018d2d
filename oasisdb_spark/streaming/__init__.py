from oasisdb_spark.streaming.events import (
    read_events_stream,
    windowed_counts,
    sessionize_stream,
)

__all__ = ["read_events_stream", "windowed_counts", "sessionize_stream"]
