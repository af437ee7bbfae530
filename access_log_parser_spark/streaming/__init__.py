from .stateful import make_sessionizer, sessionize_stream
from .stream import (
    dedup_replays_within_watermark,
    routed_stream,
    run_stream_once,
    windowed_status_counts,
)

__all__ = [
    "make_sessionizer",
    "sessionize_stream",
    "dedup_replays_within_watermark",
    "routed_stream",
    "run_stream_once",
    "windowed_status_counts",
]
