"""Honest device timing utilities.

The reference times with `time.time()` + `torch.cuda.synchronize()`
(reference: experiments/utils/training.py:210-283). On TPU the equivalent
barrier is `jax.block_until_ready` on the outputs being timed.

⚠ On the remote-attached (tunneled) TPU in this environment,
`jax.block_until_ready` is NOT a trustworthy barrier: it sometimes returns
after ~0.03 ms for a chain of matmuls whose true device time is tens of
milliseconds (observed round 2; the identical chain then measured 38 ms on
a later attempt). The only reliable barrier is fetching a VALUE to the
host (e.g. `float(jnp.sum(x))`), which costs one ~25 ms round trip — so
chain enough iterations that the round trip is amortised below a few
percent. `fetch_barrier` and `chained_time` implement this protocol; all
performance claims in this repo use them (docs/BENCHMARKING.md rule 6).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fetch_barrier(value) -> float:
    """True device barrier: reduce `value` (a pytree) to one scalar and
    fetch it to the host. Unlike block_until_ready, a value fetch cannot
    return before the producing computation has finished."""
    leaves = jax.tree_util.tree_leaves(value)
    total = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) if hasattr(x, "astype")
                else 0.0 for x in leaves)
    return float(total)


def chained_time(fn, args, steps: int, feedback, repeats: int = 3) -> float:
    """Median per-step seconds over `repeats` chains of `steps` iterations.

    `feedback(cur_args, out) -> next_args` must make each iteration's
    inputs depend on the previous output (so the device cannot overlap
    iterations), and the chain ends with a host value fetch (the only
    barrier the tunnel honours). The fetch's own ~25 ms round trip is
    measured on an already-materialised scalar and subtracted, so this
    remains accurate for sub-millisecond ops at moderate step counts.
    """
    out = fn(*args)
    fetch_barrier(out)  # compile + warm

    # round-trip cost of the barrier itself (fetching a ready value)
    ready = jnp.zeros(())
    float(ready)
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(ready))
        rts.append(time.perf_counter() - t0)
    rt = sorted(rts)[len(rts) // 2]

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        cur = args
        for _ in range(steps):
            out = fn(*cur)
            cur = feedback(cur, out)
        fetch_barrier(out)
        times.append(max(0.0, time.perf_counter() - t0 - rt) / steps)
    return sorted(times)[len(times) // 2]


class Timer:
    """Context manager measuring wall time with a device barrier.

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
        fetch_barrier(value)  # value fetch, not block_until_ready (above)
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
