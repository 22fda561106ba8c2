"""The chain's 4-ary **sorted** Merkle tree: proof type + host verifier.

Port of reference `common/src/zk_merkle.rs`: ARITY=4, MAX_DEPTH=16 (4^16 ≈
4.3e9 leaves), 3 siblings per level. Children are sorted byte-wise before
hashing, so proofs carry sorted siblings plus a 0-3 position hint instead of
path indices — the in-circuit walk then just inserts and hashes (no sorting
gadget). Node hash = 10*-padded Poseidon2 over the compact (8 bytes/felt)
encoding of the 128-byte sorted-children concatenation.

Canonicality: every 32-byte hash must have canonical 8-byte LE limbs; the
compact encoding reduces mod p, so a noncanonical byte alias of a genuine
child would hash identically (the audit-pinned attack class —
`zk_merkle.rs:40-58, 676-723`).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import serialization as sz

ARITY = 4
MAX_DEPTH = 16
SIBLINGS_PER_LEVEL = ARITY - 1
HASH_NUM_FELTS = 4
CHILDREN_BYTES = ARITY * 32
GOLDILOCKS_MODULUS = 0xFFFFFFFF00000001


def is_canonical_hash(h: bytes) -> bool:
    if len(h) != 32:
        return False
    return all(
        int.from_bytes(h[8 * i : 8 * i + 8], "little") < GOLDILOCKS_MODULUS
        for i in range(4)
    )


def empty_hash() -> bytes:
    return b"\x00" * 32


def hash_node_presorted(sorted_children: list[bytes]) -> bytes:
    assert len(sorted_children) == ARITY
    return sz.hash_bytes_compact(b"".join(sorted_children))


def hash_node(children: list[bytes]) -> bytes:
    """Order-independent node hash: sort children byte-wise, then hash."""
    for c in children:
        if not is_canonical_hash(c):
            raise ValueError("hash_node: noncanonical child hash")
    return hash_node_presorted(sorted(children))


def insert_at_position(current: bytes, siblings: list[bytes], position: int) -> list[bytes]:
    if not 0 <= position < ARITY:
        raise ValueError(f"invalid position {position}")
    out = list(siblings[:position]) + [current] + list(siblings[position:])
    return out


@dataclass
class ZkMerkleProof:
    leaf_index: int
    siblings: list  # per level: [3 x 32-byte hashes] in sorted order
    positions: list  # per level: 0-3 insertion hint
    leaf_hash: bytes
    root: bytes

    def verify_with_positions(self) -> bool:
        """Byte-exact verification with DoS depth cap and canonicality
        pre-checks (reference `zk_merkle.rs:164-205`)."""
        if len(self.siblings) > MAX_DEPTH:
            return False
        if len(self.siblings) != len(self.positions):
            return False
        if not is_canonical_hash(self.leaf_hash):
            return False
        for level in self.siblings:
            if len(level) != SIBLINGS_PER_LEVEL:
                return False
            if not all(is_canonical_hash(s) for s in level):
                return False
        current = self.leaf_hash
        for level, pos in zip(self.siblings, self.positions):
            try:
                children = insert_at_position(current, level, int(pos))
                current = hash_node_presorted(children)
            except (ValueError, sz.SerializationError):
                return False
        return current == self.root

    @classmethod
    def from_unsorted(
        cls, leaf_index: int, unsorted_siblings: list, leaf_hash: bytes, root: bytes
    ) -> "ZkMerkleProof":
        """Compute sorted siblings + positions from raw siblings
        (validate-before-hash, reference `zk_merkle.rs:218-284`)."""
        if len(unsorted_siblings) > MAX_DEPTH:
            raise ValueError("from_unsorted: proof depth exceeds MAX_DEPTH")
        if not is_canonical_hash(leaf_hash):
            raise ValueError("from_unsorted: leaf hash bytes are noncanonical")
        for level in unsorted_siblings:
            if not all(is_canonical_hash(s) for s in level):
                raise ValueError("from_unsorted: sibling hash bytes are noncanonical")
        current = leaf_hash
        sorted_sibs, positions = [], []
        for level in unsorted_siblings:
            all_four = sorted([current] + list(level))
            pos = all_four.index(current)
            positions.append(pos)
            sorted_sibs.append([h for i, h in enumerate(all_four) if i != pos])
            current = hash_node_presorted(all_four)
        return cls(
            leaf_index=leaf_index,
            siblings=sorted_sibs,
            positions=positions,
            leaf_hash=leaf_hash,
            root=root,
        )


class ZkMerkleTree:
    """Reference-style host tree builder (test fixture / chain-side model)."""

    def __init__(self, leaf_hashes: list[bytes]):
        assert leaf_hashes, "tree needs at least one leaf"
        for h in leaf_hashes:
            if not is_canonical_hash(h):
                raise ValueError("noncanonical leaf hash")
        self.levels = [list(leaf_hashes)]
        while len(self.levels[-1]) > 1:
            cur = self.levels[-1]
            nxt = []
            for i in range(0, len(cur), ARITY):
                group = cur[i : i + ARITY]
                while len(group) < ARITY:
                    group.append(empty_hash())
                nxt.append(hash_node(group))
            self.levels.append(nxt)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def prove(self, index: int) -> ZkMerkleProof:
        unsorted = []
        idx = index
        for level in self.levels[:-1]:
            base = (idx // ARITY) * ARITY
            group = []
            for j in range(ARITY):
                k = base + j
                if k == idx:
                    continue
                group.append(level[k] if k < len(level) else empty_hash())
            unsorted.append(group)
            idx //= ARITY
        return ZkMerkleProof.from_unsorted(
            index, unsorted, self.levels[0][index], self.root
        )
