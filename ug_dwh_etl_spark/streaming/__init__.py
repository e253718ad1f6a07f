from ug_dwh_etl_spark.streaming.jobs import (
    available_now_pipeline,
    read_events_stream,
    run_stream_to_memory,
    stream_dedup_events,
    stream_hourly_tumbling,
    stream_session_windows,
)

__all__ = [
    "available_now_pipeline",
    "read_events_stream",
    "run_stream_to_memory",
    "stream_dedup_events",
    "stream_hourly_tumbling",
    "stream_session_windows",
]
