from quantms_utils_spark.streaming.events import (
    attribute_purchases_stateful,
    detect_journeys_stateful,
    hourly_event_aggregate,
    read_event_stream,
    running_user_totals,
    sessionize_session_window,
    sessionize_stateful,
    stream_classify_against_corpus,
    stream_dedup_events,
    stream_purchase_click_join,
    stream_quality_filter,
)

__all__ = [
    "attribute_purchases_stateful",
    "detect_journeys_stateful",
    "hourly_event_aggregate",
    "read_event_stream",
    "running_user_totals",
    "sessionize_session_window",
    "sessionize_stateful",
    "stream_classify_against_corpus",
    "stream_dedup_events",
    "stream_purchase_click_join",
    "stream_quality_filter",
]
