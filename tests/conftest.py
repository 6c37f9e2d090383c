"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

This is the JAX idiom for exercising SPMD/multi-chip code paths without real
hardware (SURVEY.md §4); bench.py and production entry points run on the real
TPU instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A site plugin may force a hardware platform list after env parsing; pin CPU
# explicitly so tests never touch the real chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) >= 8, "virtual device mesh not active"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
