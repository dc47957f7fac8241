"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: XLA_FLAGS host-platform device
simulation). Must run before jax is imported anywhere in the test process.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: site customisation may import jax at interpreter startup (e.g. a TPU
# tunnel plugin), so setting JAX_PLATFORMS via os.environ here is too late —
# use the config API, which takes effect at first backend resolution.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
