"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` CPU devices, and Pallas kernels
are exercised in interpreter mode.  These env vars must be set before the
first ``import jax`` anywhere in the test session.
"""

import os

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS, so
# the env var alone is not enough — we also flip the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
