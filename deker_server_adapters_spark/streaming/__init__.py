from deker_server_adapters_spark.streaming.events_stream import (
    stream_events_source,
    streaming_tumbling_window,
    streaming_running_totals,
    streaming_sessionization,
)

__all__ = [
    "stream_events_source",
    "streaming_tumbling_window",
    "streaming_running_totals",
    "streaming_sessionization",
]
