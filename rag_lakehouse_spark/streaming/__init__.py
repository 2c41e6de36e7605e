from rag_lakehouse_spark.streaming.events import (
    click_purchase_stream_join,
    dedup_within_watermark,
    enrich_stream_static,
    read_events_stream,
    run_batch_to_memory,
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)
from rag_lakehouse_spark.streaming.rollup_sink import (
    maintain_hourly_rollup,
    rollup_hierarchy_from_state,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_agg",
    "dedup_within_watermark",
    "enrich_stream_static",
    "click_purchase_stream_join",
    "run_batch_to_memory",
    "maintain_hourly_rollup",
    "rollup_hierarchy_from_state",
]
