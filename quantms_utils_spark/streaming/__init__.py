from quantms_utils_spark.streaming.events import (
    hourly_event_aggregate,
    read_event_stream,
    sessionize_stateful,
    stream_dedup_events,
    stream_purchase_click_join,
    stream_quality_filter,
)

__all__ = [
    "hourly_event_aggregate",
    "read_event_stream",
    "sessionize_stateful",
    "stream_dedup_events",
    "stream_purchase_click_join",
    "stream_quality_filter",
]
