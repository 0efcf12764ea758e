from changegen_spark.streaming.events import (
    sessionize_stream,
    stream_events,
    windowed_counts_stream,
)

__all__ = ["stream_events", "windowed_counts_stream", "sessionize_stream"]
