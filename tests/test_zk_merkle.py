"""4-ary sorted Merkle tree tests, mirroring the reference's adversarial
suite (`common/src/zk_merkle.rs:676-723`): round-trips, sorted-insert
positions, noncanonical-alias rejection, depth DoS cap."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.utils import zk_merkle as zm

P = 0xFFFFFFFF00000001


def _leaf(i: int) -> bytes:
    # arbitrary canonical 32-byte hashes
    return (i + 1).to_bytes(8, "little") + b"\x00" * 24


class TestZkMerkle:
    def test_prove_verify_roundtrip(self):
        leaves = [_leaf(i) for i in range(17)]  # forces padding + 3 levels
        tree = zm.ZkMerkleTree(leaves)
        for idx in [0, 1, 3, 4, 15, 16]:
            proof = tree.prove(idx)
            assert proof.verify_with_positions(), idx
            assert len(proof.siblings) == 3

    def test_order_independence(self):
        a = [_leaf(i) for i in range(4)]
        import itertools

        roots = {zm.hash_node(list(perm)).hex() for perm in itertools.permutations(a)}
        assert len(roots) == 1

    def test_wrong_root_fails(self):
        tree = zm.ZkMerkleTree([_leaf(i) for i in range(8)])
        proof = tree.prove(2)
        proof.root = _leaf(99)
        assert not proof.verify_with_positions()

    def test_bad_position_fails(self):
        tree = zm.ZkMerkleTree([_leaf(i) for i in range(8)])
        proof = tree.prove(2)
        proof.positions = [5] + proof.positions[1:]
        assert not proof.verify_with_positions()

    def test_noncanonical_alias_rejected(self):
        """A sibling whose first limb is v+p (same felt, different bytes) must
        be rejected — the load-bearing canonicality precondition."""
        tree = zm.ZkMerkleTree([_leaf(i) for i in range(8)])
        proof = tree.prove(0)
        sib = bytearray(proof.siblings[0][0])
        v = int.from_bytes(sib[:8], "little")
        alias = (v + P) % (1 << 64)
        if alias >= P:  # alias representable only if v + p < 2^64
            sib[:8] = alias.to_bytes(8, "little")
            proof.siblings[0][0] = bytes(sib)
            assert not proof.verify_with_positions()
        # noncanonical leaf hash also rejected
        proof2 = tree.prove(0)
        proof2.leaf_hash = (P).to_bytes(8, "little") + b"\x00" * 24
        assert not proof2.verify_with_positions()

    def test_depth_dos_cap(self):
        proof = zm.ZkMerkleProof(
            leaf_index=0,
            siblings=[[_leaf(1), _leaf(2), _leaf(3)]] * 17,
            positions=[0] * 17,
            leaf_hash=_leaf(0),
            root=_leaf(9),
        )
        assert not proof.verify_with_positions()

    def test_single_leaf_depth_zero(self):
        tree = zm.ZkMerkleTree([_leaf(0)])
        proof = tree.prove(0)
        assert proof.siblings == [] and proof.verify_with_positions()
        assert tree.root == _leaf(0)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
