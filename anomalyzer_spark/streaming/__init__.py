from .detect_stream import detect_stream, run_stream_on_dir
from .resample_stream import resample_stream

__all__ = ["detect_stream", "resample_stream", "run_stream_on_dir"]
