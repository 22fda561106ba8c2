"""Multi-chip sharding: run the driver's dryrun in a CPU subprocess with 8
virtual devices (the in-process suite may hold the single real TPU)."""

import os
import subprocess
import sys

import pytest


def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache');"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 2);"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
