from .anomaly import make_rate_anomaly, rate_anomaly_stream
from .stateful import make_sessionizer, sessionize_stream
from .stream import (
    dedup_replays_within_watermark,
    routed_stream,
    run_stream_once,
    windowed_status_counts,
)

__all__ = [
    "make_rate_anomaly",
    "rate_anomaly_stream",
    "make_sessionizer",
    "sessionize_stream",
    "dedup_replays_within_watermark",
    "routed_stream",
    "run_stream_once",
    "windowed_status_counts",
]
