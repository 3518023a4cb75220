from .stream import (
    read_event_stream,
    run_stream_to_memory,
    streaming_session_counts,
    streaming_window_counts,
)

__all__ = [
    "read_event_stream",
    "run_stream_to_memory",
    "streaming_session_counts",
    "streaming_window_counts",
]
