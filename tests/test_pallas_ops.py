"""Pallas kernel bit-exactness vs the jnp field layer (interpret mode on CPU,
compiled when a TPU is the default device)."""

import numpy as np
import pytest

import jax

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.field import goldilocks as gl
from qp_zk_circuits_tpu.ops.field_kernels import mul_pallas


class TestPallasMul:
    def test_matches_oracle(self, rng):
        a = F.rand_felts(1000, rng)
        b = F.rand_felts(1000, rng)
        a[:4] = [0, 1, F.P - np.uint64(1), 0xFFFFFFFF]
        b[:4] = [F.P - np.uint64(1), F.P - np.uint64(2), F.P - np.uint64(1), 0x100000000]
        interpret = jax.devices()[0].platform != "tpu"
        out = mul_pallas(gl.from_u64(a), gl.from_u64(b), interpret=interpret)
        assert np.array_equal(gl.to_u64(out), F.mul(a, b))

    def test_2d_shapes(self, rng):
        a = F.rand_felts((7, 33), rng)
        b = F.rand_felts((7, 33), rng)
        interpret = jax.devices()[0].platform != "tpu"
        out = mul_pallas(gl.from_u64(a), gl.from_u64(b), interpret=interpret)
        assert np.array_equal(gl.to_u64(out), F.mul(a, b))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
