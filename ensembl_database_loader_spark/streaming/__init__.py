from ensembl_database_loader_spark.streaming.windows import (
    dedup_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    stream_events,
    stream_static_join,
    tumbling_agg,
)

__all__ = [
    "stream_events",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_stream",
    "stream_static_join",
    "run_available_now",
]
