"""Test configuration: force an 8-device virtual CPU platform.

The reference never tests distributed paths (SURVEY.md §4.6); we do better
by running every test on a host-device-count-spoofed CPU so sharding and
collectives are exercised without TPU hardware.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (TPU plugin), and
# only JAX_PLATFORM_NAME reliably overrides it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

# No persistent compilation cache under tests: once an integration test
# imports training.experiment the cache stays enabled process-wide, and
# a later pallas-interpret compile segfaulted inside JAX's executable
# serializer (observed r5, jax compilation_cache.put_executable_and_time).
# CPU test shapes compile in seconds; the cache only adds flake risk.
os.environ["TSASR_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may already have imported jax before this conftest; the
# config update still applies as long as no backend is initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
