"""Explicit PRNG-key threading helpers.

The reference relies on torch/numpy global RNG state
(reference: experiments/utils/benchmark_utils.py:259-276 `set_random_seeds`).
In JAX randomness is explicit; these helpers make key management terse.
"""

from __future__ import annotations

import jax


def split_key(key, n: int = 2):
    """Split a key into n new keys."""
    return jax.random.split(key, n)


def key_iter(seed_or_key):
    """Infinite iterator of fresh PRNG keys derived from a seed or key.

    Usage::

        keys = key_iter(42)
        k1 = next(keys)
        k2 = next(keys)
    """
    if isinstance(seed_or_key, int):
        key = jax.random.PRNGKey(seed_or_key)
    else:
        key = seed_or_key
    while True:
        key, sub = jax.random.split(key)
        yield sub
