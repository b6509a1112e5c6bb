from .detect_stream import detect_stream, run_stream_on_dir
from .resample_stream import resample_stream, run_resample_stream_on_dir

__all__ = ["detect_stream", "resample_stream", "run_resample_stream_on_dir",
           "run_stream_on_dir"]
