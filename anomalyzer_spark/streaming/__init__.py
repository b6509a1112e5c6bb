from .detect_stream import detect_stream, run_stream_on_dir

__all__ = ["detect_stream", "run_stream_on_dir"]
