from .windows import (
    run_available_now_to_memory,
    run_foreach_batch_to_parquet,
    session_counts,
    sliding_counts,
    stateful_running_count,
    stream_events,
    stream_static_enrich,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stateful_running_count",
    "streaming_dedup",
    "stream_static_enrich",
    "run_available_now_to_memory",
    "run_foreach_batch_to_parquet",
]
