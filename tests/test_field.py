"""Field-layer tests: numpy oracle vs Python-int ground truth vs JAX lanes.

Mirrors the reference's reliance on exact Goldilocks semantics (canonical vs
lazy reduction — reference `wormhole/tests/tests/encoding_safety.rs:40-69`,
modulus constants `common/src/zk_merkle.rs:41`).
"""

import numpy as np
import pytest

from qp_zk_circuits_tpu.field import extension as ext
from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.field import goldilocks as gl

P = 0xFFFFFFFF00000001

EDGE = np.array(
    [0, 1, 2, 0xFFFFFFFF, 0x100000000, P - 1, P - 2, P // 2, 0x185629DCDA58878C, 7],
    dtype=np.uint64,
)


def _pairs(rng, n=512):
    a = F.rand_felts(n, rng)
    b = F.rand_felts(n, rng)
    a[: len(EDGE)] = EDGE
    b[: len(EDGE)] = EDGE[::-1].copy()
    return a, b


class TestNumpyOracle:
    def test_add_sub_mul_vs_python_int(self, rng):
        a, b = _pairs(rng)
        for i in range(len(a)):
            ai, bi = int(a[i]), int(b[i])
            assert int(F.add(a[i], b[i])) == (ai + bi) % P
            assert int(F.sub(a[i], b[i])) == (ai - bi) % P
            assert int(F.mul(a[i], b[i])) == (ai * bi) % P
            assert int(F.neg(a[i])) == (-ai) % P

    def test_noncanonical_aliasing(self):
        # from_noncanonical_u64(p) == 0 — the {0, p} collision the reference's
        # encoding-safety suite witnesses.
        assert int(F.from_noncanonical_u64(np.uint64(P))) == 0
        assert int(F.from_noncanonical_u64(np.uint64(P) + np.uint64(5))) == 5
        assert not F.is_canonical(np.uint64(P))
        assert F.is_canonical(np.uint64(P - 1))

    def test_inv(self, rng):
        a = F.rand_felts(64, rng)
        a[0] = 1
        prod = F.mul(a, F.inv(a))
        assert np.all(prod == 1)
        assert int(F.inv(np.uint64(0))) == 0

    def test_batch_inv(self, rng):
        a = F.rand_felts(33, rng)
        assert np.array_equal(F.batch_inv(a), F.inv(a))

    def test_roots_of_unity(self):
        w = int(F.POWER_OF_TWO_GENERATOR)
        assert pow(w, 1 << 32, P) == 1
        assert pow(w, 1 << 31, P) != 1
        w8 = int(F.primitive_root_of_unity(3))
        assert pow(w8, 8, P) == 1 and pow(w8, 4, P) != 1
        sub = F.two_adic_subgroup(3)
        assert len(set(int(x) for x in sub)) == 8

    def test_generator_order(self):
        # 7 generates F_p^*: it is a non-residue for each prime factor of p-1.
        g = int(F.MULTIPLICATIVE_GROUP_GENERATOR)
        for q in [2, 3, 5, 17, 257, 65537]:
            assert pow(g, (P - 1) // q, P) != 1


class TestJaxLanes:
    # JAX eager mode compiles every distinct primitive+shape (~0.5 s each on
    # this box) — so ALL device work goes through one jitted bundle per test.

    def test_ops_match_oracle(self, rng):
        import jax

        a, b = _pairs(rng)
        mask = np.arange(len(a)) % 2 == 0

        @jax.jit
        def bundle(ja, jb):
            return dict(
                add=gl.add(ja, jb),
                sub=gl.sub(ja, jb),
                mul=gl.mul(ja, jb),
                neg=gl.neg(ja),
                sqr=gl.sqr(ja),
                exp7=gl.exp7(ja),
                pow=gl.pow_const(ja, 11),
                sel=gl.select(mask, ja, jb),
                eq=gl.eq(ja, ja),
                sum=gl.sum_tree(ja, axis=0),
            )

        out = bundle(gl.from_u64(a), gl.from_u64(b))
        assert np.array_equal(gl.to_u64(out["add"]), F.add(a, b))
        assert np.array_equal(gl.to_u64(out["sub"]), F.sub(a, b))
        assert np.array_equal(gl.to_u64(out["mul"]), F.mul(a, b))
        assert np.array_equal(gl.to_u64(out["neg"]), F.neg(a))
        assert np.array_equal(gl.to_u64(out["sqr"]), F.mul(a, a))
        assert np.array_equal(gl.to_u64(out["exp7"]), F.pow_scalar(a, 7))
        assert np.array_equal(gl.to_u64(out["pow"]), F.pow_scalar(a, 11))
        assert np.array_equal(gl.to_u64(out["sel"]), np.where(mask, a, b))
        assert np.array_equal(np.asarray(out["eq"]), np.ones(len(a), bool))
        total = np.uint64(0)
        for x in a:
            total = F.add(total, x)
        assert int(gl.to_u64(out["sum"])[0]) == int(total)

    def test_inv(self, rng):
        import jax

        a = F.rand_felts(8, rng)
        ja = gl.from_u64(a)
        out = jax.jit(gl.inv)(ja)
        assert np.array_equal(gl.to_u64(out), F.inv(a))


class TestExtension:
    def test_w_is_nonresidue(self):
        assert pow(ext.W, (P - 1) // 2, P) == P - 1

    def test_mul_inv(self, rng):
        a = ext.rand((16,), rng)
        b = ext.rand((16,), rng)
        ab = ext.mul(a, b)
        back = ext.mul(ab, ext.inv(b))
        assert np.all(ext.eq(back, a))

    def test_mul_matches_int(self, rng):
        a = ext.rand((8,), rng)
        b = ext.rand((8,), rng)
        c = ext.mul(a, b)
        for i in range(8):
            a0, a1 = int(a[i, 0]), int(a[i, 1])
            b0, b1 = int(b[i, 0]), int(b[i, 1])
            assert int(c[i, 0]) == (a0 * b0 + 7 * a1 * b1) % P
            assert int(c[i, 1]) == (a0 * b1 + a1 * b0) % P

    def test_frobenius_order(self, rng):
        # x^(p^2) == x for all x in F_{p^2}
        a = ext.rand((4,), rng)
        assert np.all(ext.eq(ext.pow_scalar(a, P * P), a))

    def test_jax_matches_numpy(self, rng):
        import jax

        a = ext.rand((512,), rng)
        b = ext.rand((512,), rng)
        ja, jb = ext.j_from_u64(a), ext.j_from_u64(b)

        @jax.jit
        def bundle(x, y):
            return ext.j_mul(x, y), ext.j_add(x, y), ext.j_sub(x, y)

        m, ad, sb = bundle(ja, jb)
        assert np.array_equal(ext.j_to_u64(m), ext.mul(a, b))
        assert np.array_equal(ext.j_to_u64(ad), ext.add(a, b))
        assert np.array_equal(ext.j_to_u64(sb), ext.sub(a, b))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
