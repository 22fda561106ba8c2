"""Hashing layers: Poseidon2 permutation/sponges, Merkle trees with caps, keccak pinning."""

from .poseidon2 import (  # noqa: F401
    DIGEST_LEN,
    RATE,
    WIDTH,
    hash_no_pad,
    hash_padded,
    permute,
    two_to_one,
)
