from polars_view_spark.streaming.events import (
    read_event_stream,
    streaming_running_counts,
    streaming_tumbling_agg,
)

__all__ = [
    "read_event_stream",
    "streaming_running_counts",
    "streaming_tumbling_agg",
]
