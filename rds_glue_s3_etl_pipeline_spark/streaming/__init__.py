from .ops import (  # noqa: F401
    read_event_stream,
    tumbling_counts,
    sliding_counts,
    session_window_agg,
    stateful_dedup,
    stream_static_join,
    notify_each_batch,
)
