from .stream import routed_stream, run_stream_once, windowed_status_counts

__all__ = ["routed_stream", "run_stream_once", "windowed_status_counts"]
