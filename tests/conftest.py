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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's in-process parallel LLVM codegen segfaulted intermittently
    # (SIGSEGV inside backend_compile_and_load) in long many-compile pytest
    # sessions on this single-core VM; serializing codegen removes the
    # thread-pool path.  Compiles are single-core-bound here anyway.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
