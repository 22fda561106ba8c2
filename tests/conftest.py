"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the single real TPU chip; tests exercise identical code
paths on CPU (the field/hash/NTT layers are pure jnp and compile on both), and
multi-chip sharding tests get 8 virtual CPU devices.
"""

import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS *env var*; only the
# jax.config API can force CPU. The suite runs against the default device
# (the real TPU when attached — XLA compiles the big prover graphs far faster
# there than on this host's CPU). Set QZKT_TEST_CPU=1 to force CPU (used by
# the sharding tests' subprocess, which needs 8 virtual devices).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("QZKT_TEST_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the Poseidon2/NTT/prover graphs are large and XLA
# CPU compiles are slow here; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# only persist expensive graphs — caching every tiny eager op thrashes the disk
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
