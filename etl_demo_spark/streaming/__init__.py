from etl_demo_spark.streaming.windows import (
    enriched_purchase_stats,
    hourly_event_stats,
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_counts,
)

__all__ = [
    "enriched_purchase_stats",
    "hourly_event_stats",
    "read_events_stream",
    "run_stream_to_memory",
    "session_window_agg",
    "sliding_window_counts",
]
