from .windows import (
    run_available_now_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    stateful_running_count,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stateful_running_count",
    "run_available_now_to_memory",
]
