from rag_lakehouse_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_batch_to_memory,
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_agg",
    "dedup_within_watermark",
    "run_batch_to_memory",
]
