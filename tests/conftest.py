"""Test configuration: 8 virtual CPU devices for multi-chip sharding tests.

Must set env vars before the first jax import anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "True"

# The environment pre-imports jax via a sitecustomize hook, so env vars above
# may be read too late; jax.config.update still works pre-backend-init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# float64 available for CPU parity tests; all library code uses explicit
# dtypes so this does not change float32 code paths.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
