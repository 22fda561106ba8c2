"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the single real TPU chip; tests exercise identical code
paths on CPU (the field/hash/NTT layers are pure jnp and compile on both), and
multi-chip sharding tests get 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
