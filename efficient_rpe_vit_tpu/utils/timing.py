"""Honest device timing utilities.

The reference times with `time.time()` + `torch.cuda.synchronize()`
(reference: experiments/utils/training.py:210-283). On TPU the equivalent
barrier is `jax.block_until_ready` on the outputs being timed.
"""

from __future__ import annotations

import time

import jax


class Timer:
    """Context manager measuring wall time with an optional device barrier.

    >>> with Timer() as t:
    ...     y = step(x)
    ...     t.block_on(y)
    >>> t.elapsed  # seconds
    """

    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = None
        return self

    def block_on(self, value):
        jax.block_until_ready(value)
        return value

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def device_memory_stats(device=None) -> dict:
    """Device memory counters (bytes) — the TPU analogue of the reference's
    CUDA peak-memory capture (training.py:94-97). Returns {} when the
    backend doesn't expose stats (e.g. CPU)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def format_time(seconds: float) -> str:
    """Format seconds as h/m/s string (reference: benchmark_utils.py:297-316)."""
    if seconds < 60:
        return f"{seconds:.1f}s"
    if seconds < 3600:
        m, s = divmod(seconds, 60)
        return f"{int(m)}m {s:.0f}s"
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return f"{int(h)}h {int(m)}m {s:.0f}s"
