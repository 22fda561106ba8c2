"""NTT / coset-LDE / Merkle tests against naive Python-int oracles."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.field import goldilocks as gl
from qp_zk_circuits_tpu.hash import merkle, poseidon2 as ps
from qp_zk_circuits_tpu.poly import ntt

P = 0xFFFFFFFF00000001


def _naive_ntt(coeffs):
    """O(N^2) Python-int DFT over the subgroup, natural order."""
    n = len(coeffs)
    w = int(F.primitive_root_of_unity(n.bit_length() - 1))
    return [
        sum(int(coeffs[j]) * pow(w, i * j, P) for j in range(n)) % P for i in range(n)
    ]


class TestNTTHost:
    def test_matches_naive(self, rng):
        c = F.rand_felts(16, rng)
        assert [int(v) for v in ntt.ntt_np(c)] == _naive_ntt(c)

    def test_roundtrip(self, rng):
        c = F.rand_felts((3, 256), rng)
        assert np.array_equal(ntt.intt_np(ntt.ntt_np(c)), c)

    def test_coset_lde(self, rng):
        c = F.rand_felts(8, rng)
        evals = ntt.coset_lde_np(c, rate_bits=2)
        # check a couple of points by Horner
        g = int(F.MULTIPLICATIVE_GROUP_GENERATOR)
        w = int(F.primitive_root_of_unity(5))
        for i in [0, 1, 17, 31]:
            x = g * pow(w, i, P) % P
            want = sum(int(c[j]) * pow(x, j, P) for j in range(8)) % P
            assert int(evals[i]) == want

    def test_eval_poly(self, rng):
        c = F.rand_felts(10, rng)
        x = 12345
        want = sum(int(c[j]) * pow(x, j, P) for j in range(10)) % P
        assert int(ntt.eval_poly_np(c, np.uint64(x))) == want


class TestNTTDevice:
    def test_matches_host(self, rng):
        import jax

        c = F.rand_felts((4, 512), rng)
        out = jax.jit(ntt.ntt_j)(gl.from_u64(c))
        assert np.array_equal(gl.to_u64(out), ntt.ntt_np(c))
        inv = jax.jit(ntt.intt_j)(gl.from_u64(c))
        assert np.array_equal(gl.to_u64(inv), ntt.intt_np(c))

    def test_coset_lde_matches_host(self, rng):
        import jax

        c = F.rand_felts((2, 128), rng)
        out = jax.jit(lambda x: ntt.coset_lde_j(x, 3))(gl.from_u64(c))
        assert np.array_equal(gl.to_u64(out), ntt.coset_lde_np(c, 3))


class TestMerkle:
    def test_build_and_verify(self, rng):
        import jax

        leaves = F.rand_felts((64, 7), rng)
        tree = merkle.build_merkle_tree(gl.from_u64(leaves), cap_height=2)
        assert tree.cap.shape == (4, 4)
        for idx in [0, 1, 31, 63]:
            sibs = tree.prove(idx)
            assert sibs.shape == (4, 4)  # log2(64) - cap_height 2 = 4 levels
            assert merkle.verify_merkle_proof(leaves[idx], idx, sibs, tree.cap)
        # tamper: wrong leaf fails
        bad = leaves[0].copy()
        bad[0] ^= np.uint64(1)
        assert not merkle.verify_merkle_proof(bad, 0, tree.prove(0), tree.cap)
        # tamper: right leaf, wrong index fails
        assert not merkle.verify_merkle_proof(leaves[0], 1, tree.prove(0), tree.cap)

    def test_matches_host_hash_chain(self, rng):
        """Root of a height-3 no-cap tree equals manual host chain."""
        leaves = F.rand_felts((8, 5), rng)
        tree = merkle.build_merkle_tree(gl.from_u64(leaves), cap_height=0)
        digests = [ps.hash_no_pad(leaves[i]) for i in range(8)]
        while len(digests) > 1:
            digests = [ps.two_to_one(digests[i], digests[i + 1]) for i in range(0, len(digests), 2)]
        assert np.array_equal(tree.cap[0], digests[0])

    def test_short_leaves_noop(self, rng):
        """K <= 4 leaves commit as zero-padded copies (hash_or_noop)."""
        leaves = F.rand_felts((4, 3), rng)
        tree = merkle.build_merkle_tree(gl.from_u64(leaves), cap_height=2)
        want = np.zeros((4, 4), dtype=np.uint64)
        want[:, :3] = leaves
        assert np.array_equal(tree.levels[0], want)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
