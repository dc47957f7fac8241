from .prng import key_iter, split_key
from .timing import Timer, format_time, device_memory_stats

__all__ = ["key_iter", "split_key", "Timer", "format_time", "device_memory_stats"]
