from .detect import detect, detect_by_test, tail_window

__all__ = ["detect", "detect_by_test", "tail_window"]
