"""CircuitInputs container + host-side derivations (nullifier, unspendable
account, block header hash).

Port of reference `wormhole/circuit/src/inputs.rs` (container + redaction),
`nullifier.rs` (H(H("~nullif~" || secret || transfer_count))),
`unspendable_account.rs` (H(H("wormhole" || secret))) and
`block_header/header.rs` (45-felt header preimage)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..hash import poseidon2 as ps
from ..utils import serialization as sz
from . import inputs as wi
from .sensitive import Secret, SensitiveFelts

NULLIFIER_SALT = "~nullif~"
UNSPENDABLE_SALT = "wormhole"
DIGEST_LOGS_SIZE = 110
DIGEST_LOGS_FELTS = 28  # 110 bytes -> injective 4B/felt encoding -> 28 felts
MAX_DEPTH = 16
SIBLINGS_PER_LEVEL = 3


def double_hash(preimage: np.ndarray) -> np.ndarray:
    """The spec's hh: H((H p)) — outer hash over the 4-felt inner digest."""
    inner = ps.hash_no_pad(preimage)
    return ps.hash_no_pad(inner)


def nullifier_from_preimage(secret: Secret, transfer_count: int) -> np.ndarray:
    """nullifier = H(H(salt(3) || secret(4) || transfer_count(2))) -> 4 felts."""
    salt = sz.string_to_felts(NULLIFIER_SALT)
    assert len(salt) == 3
    pre = SensitiveFelts(
        np.concatenate([salt, secret.expose_felts(), sz.u64_to_felts(transfer_count)])
    )
    out = double_hash(pre.view())
    pre.scrub()
    return out


def unspendable_account_from_secret(secret: Secret) -> np.ndarray:
    """account_id = H(H(salt(3) || secret(4))) -> 4 felts."""
    salt = sz.string_to_felts(UNSPENDABLE_SALT)
    assert len(salt) == 3
    pre = SensitiveFelts(np.concatenate([salt, secret.expose_felts()]))
    out = double_hash(pre.view())
    pre.scrub()
    return out


def compute_zk_leaf_hash(
    to_account_felts: np.ndarray, transfer_count: int, asset_id: int, input_amount: int
) -> np.ndarray:
    """Leaf hash preimage: to(4) || tc(2) || asset(1) || amount(1) -> H (4 felts).
    (reference `zk_merkle_proof.rs:52` / test-helpers `compute_zk_leaf_hash`)."""
    pre = np.concatenate(
        [
            np.asarray(to_account_felts, dtype=np.uint64),
            sz.u64_to_felts(transfer_count),
            np.array([asset_id, input_amount], dtype=np.uint64),
        ]
    )
    return ps.hash_no_pad(pre)


@dataclass
class HeaderInputs:
    """Felt-encoded block header: the 45-felt preimage of block_hash."""

    parent_hash: np.ndarray  # (4,)
    block_number: int
    state_root: np.ndarray  # (4,)
    extrinsics_root: np.ndarray  # (4,)
    zk_tree_root: np.ndarray  # (4,)
    digest: np.ndarray  # (28,) injectively encoded 110 bytes

    @classmethod
    def new(
        cls,
        parent_hash: bytes,
        block_number: int,
        state_root: bytes,
        extrinsics_root: bytes,
        zk_tree_root: bytes,
        digest: bytes,
    ) -> "HeaderInputs":
        if len(digest) != DIGEST_LOGS_SIZE:
            raise ValueError(f"digest must be {DIGEST_LOGS_SIZE} bytes")
        digest_felts = sz.bytes_to_felts(digest)
        assert len(digest_felts) == DIGEST_LOGS_FELTS
        return cls(
            parent_hash=sz.bytes_to_digest(parent_hash),
            block_number=int(block_number),
            state_root=sz.bytes_to_digest(state_root),
            extrinsics_root=sz.bytes_to_digest(extrinsics_root),
            zk_tree_root=sz.bytes_to_digest(zk_tree_root),
            digest=digest_felts,
        )

    def preimage(self) -> np.ndarray:
        return np.concatenate(
            [
                self.parent_hash,
                np.array([self.block_number], dtype=np.uint64),
                self.state_root,
                self.extrinsics_root,
                self.zk_tree_root,
                self.digest,
            ]
        )

    def block_hash(self) -> bytes:
        """Host block hash (reference `header.rs:132-141`)."""
        return sz.digest_to_bytes(ps.hash_no_pad(self.preimage()))

    def __repr__(self):
        return (
            f"HeaderInputs(block_number={self.block_number}, digest=[REDACTED], ...)"
        )


@dataclass
class PrivateCircuitInputs:
    """Private witness side (redacting repr — reference `inputs.rs:98-114`)."""

    secret: Secret
    transfer_count: int
    unspendable_account: bytes  # 32B account id
    parent_hash: bytes
    state_root: bytes
    extrinsics_root: bytes
    digest: bytes  # 110 bytes
    input_amount: int  # quantized u32
    zk_tree_root: bytes
    siblings: list  # per level: [3 x 32-byte hashes], sorted order
    positions: list  # per level: 0..3

    def __repr__(self):
        return (
            f"PrivateCircuitInputs(transfer_count=[REDACTED], secret=[REDACTED], "
            f"depth={len(self.siblings)}, ...)"
        )


@dataclass
class CircuitInputs:
    """Full inputs of one leaf proof (move-only in spirit: secret inside)."""

    public: wi.PublicCircuitInputs
    private: PrivateCircuitInputs

    def __repr__(self):
        return f"CircuitInputs(public={self.public!r}, private={self.private!r})"
