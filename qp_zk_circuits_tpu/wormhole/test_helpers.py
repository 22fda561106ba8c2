"""Canonical witness fixtures for tests and profiling.

Mirror of reference `wormhole/tests/test-helpers/src/lib.rs`: two fixed
secrets/transfer-counts, a depth-0 dummy-mode fixture (`test_inputs_0`) and a
depth-1 real fixture where two distinct real spends share one block/root
(the `two_real_leaves_same_block` pattern, reference
`aggregator_tests.rs:184-253`)."""

from __future__ import annotations

import numpy as np

from ..utils import serialization as sz
from ..utils import zk_merkle as zm
from . import inputs as wi
from .circuit_inputs import (
    CircuitInputs,
    HeaderInputs,
    PrivateCircuitInputs,
    compute_zk_leaf_hash,
    nullifier_from_preimage,
    unspendable_account_from_secret,
)
from .sensitive import Secret

DEFAULT_SECRETS = [
    "4c8587bd422e01d961acdc75e7d66f6761b7af7c9b1864a492f369c9d6724f05",
    "c6034553e5556630d24a593d2c92de9f1ede81d48f0fb3371764462cc3594b3f",
]
DEFAULT_TRANSFER_COUNTS = [4, 98]
DEFAULT_INPUT_AMOUNTS = [100, 300]
DEFAULT_OUTPUT_AMOUNTS = [99, 297]
DEFAULT_VOLUME_FEE_BPS = 10  # 0.1%
DEFAULT_EXIT_ACCOUNT = bytes([4] * 32)
DEFAULT_PARENT_HASH = bytes([1] * 8) + bytes(24)
DEFAULT_STATE_ROOT = bytes([2] * 8) + bytes(24)
DEFAULT_EXTRINSICS_ROOT = bytes([3] * 8) + bytes(24)
DEFAULT_DIGEST = bytes(range(110))
DEFAULT_BLOCK_NUMBER = 1234


def _secret(i: int) -> Secret:
    return Secret.from_hex(DEFAULT_SECRETS[i])


def leaf_data(i: int, asset_id: int = 0):
    """(leaf_hash_bytes, unspendable_account_bytes, secret) for fixture i."""
    secret = _secret(i)
    account_felts = unspendable_account_from_secret(secret)
    account = sz.digest_to_bytes(account_felts)
    leaf_hash = sz.digest_to_bytes(
        compute_zk_leaf_hash(
            sz.bytes_to_digest(account),
            DEFAULT_TRANSFER_COUNTS[i],
            asset_id,
            DEFAULT_INPUT_AMOUNTS[i],
        )
    )
    return leaf_hash, account, secret


def test_inputs_0() -> CircuitInputs:
    """Depth-0 dummy-mode fixture: block_hash = 0, outputs = 0, but real
    Merkle/unspendable-account data (reference `test-helpers` test_inputs_0)."""
    leaf_hash, account, secret = leaf_data(0)
    nullifier = sz.digest_to_bytes(
        nullifier_from_preimage(secret, DEFAULT_TRANSFER_COUNTS[0])
    )
    public = wi.PublicCircuitInputs(
        asset_id=0,
        output_amount_1=0,
        output_amount_2=0,
        volume_fee_bps=DEFAULT_VOLUME_FEE_BPS,
        nullifier=wi.BytesDigest(nullifier),
        exit_account_1=wi.BytesDigest(DEFAULT_EXIT_ACCOUNT),
        exit_account_2=wi.BytesDigest.zero(),
        block_hash=wi.BytesDigest.zero(),
        block_number=0,
    )
    private = PrivateCircuitInputs(
        secret=secret,
        transfer_count=DEFAULT_TRANSFER_COUNTS[0],
        unspendable_account=account,
        parent_hash=DEFAULT_PARENT_HASH,
        state_root=DEFAULT_STATE_ROOT,
        extrinsics_root=DEFAULT_EXTRINSICS_ROOT,
        digest=DEFAULT_DIGEST,
        input_amount=DEFAULT_INPUT_AMOUNTS[0],
        zk_tree_root=leaf_hash,  # depth-0: leaf hash IS the root
        siblings=[],
        positions=[],
    )
    return CircuitInputs(public=public, private=private)


def two_real_leaves_same_block(asset_id: int = 0):
    """Two REAL (non-dummy) spends sharing one depth-1 4-ary tree and block.

    Returns (inputs_0, inputs_1): full constraint coverage — Merkle walk,
    fee, nullifier and header bindings all active."""
    return n_real_leaves_same_block(2, asset_id)


def _derived_secret(i: int) -> Secret:
    """Deterministic distinct secrets: fixtures 0/1 are the reference's two
    canonical secrets; i >= 2 derives fresh ones by hashing the index (the
    reference only ships two — `test-helpers/src/lib.rs:18-40` — because its
    full-width batches use the fake-leaf backend; ours prove REAL leaves)."""
    if i < len(DEFAULT_SECRETS):
        return Secret.from_hex(DEFAULT_SECRETS[i])
    import hashlib

    buf = bytearray(hashlib.sha256(b"qzkt-fixture-secret-%d" % i).digest())
    for k in range(4):
        buf[8 * k + 7] &= 0x7F  # clear each limb's top bit -> canonical (< p)
    return Secret(bytes(buf))


def n_real_leaves_same_block(n: int, asset_id: int = 0):
    """N REAL (non-dummy) spends sharing one 4-ary tree and block.

    Generalizes the reference's `two_real_leaves_same_block` fixture
    (`aggregator_tests.rs:184-253`) to full-width batches: N distinct
    secrets/transfer-counts give N distinct nullifiers (the private-batch
    distinctness constraint requires it), all bound to ONE block header, so
    the whole batch is admissible to a single private-batch proof. The tree
    is padded to the next 4-power with filler leaves."""
    assert 1 <= n <= 64
    datas = []
    for i in range(n):
        secret = _derived_secret(i)
        tc = DEFAULT_TRANSFER_COUNTS[i] if i < 2 else 100 + i
        amt_in = DEFAULT_INPUT_AMOUNTS[i] if i < 2 else 100 * (i + 1)
        amt_out = DEFAULT_OUTPUT_AMOUNTS[i] if i < 2 else 99 * (i + 1)
        account_felts = unspendable_account_from_secret(secret)
        account = sz.digest_to_bytes(account_felts)
        leaf_hash = sz.digest_to_bytes(
            compute_zk_leaf_hash(
                sz.bytes_to_digest(account), tc, asset_id, amt_in
            )
        )
        datas.append((leaf_hash, account, secret, tc, amt_in, amt_out))

    leaves = [d[0] for d in datas]
    width = 4
    while width < n:
        width *= 4
    for j in range(n, width):
        leaves.append(
            sz.digest_to_bytes(
                np.array([11 + 10 * j, 12, 13, 14], dtype=np.uint64)
            )
        )
    tree = zm.ZkMerkleTree(leaves)
    root = tree.root

    header = HeaderInputs.new(
        DEFAULT_PARENT_HASH,
        DEFAULT_BLOCK_NUMBER,
        DEFAULT_STATE_ROOT,
        DEFAULT_EXTRINSICS_ROOT,
        root,
        DEFAULT_DIGEST,
    )
    block_hash = header.block_hash()

    out = []
    for i, (leaf, account, secret, tc, amt_in, amt_out) in enumerate(datas):
        proof = tree.prove(i)
        nullifier = sz.digest_to_bytes(nullifier_from_preimage(secret, tc))
        public = wi.PublicCircuitInputs(
            asset_id=asset_id,
            output_amount_1=amt_out,
            output_amount_2=0,
            volume_fee_bps=DEFAULT_VOLUME_FEE_BPS,
            nullifier=wi.BytesDigest(nullifier),
            exit_account_1=wi.BytesDigest(DEFAULT_EXIT_ACCOUNT),
            exit_account_2=wi.BytesDigest.zero(),
            block_hash=wi.BytesDigest(block_hash),
            block_number=DEFAULT_BLOCK_NUMBER,
        )
        private = PrivateCircuitInputs(
            secret=secret,
            transfer_count=tc,
            unspendable_account=account,
            parent_hash=DEFAULT_PARENT_HASH,
            state_root=DEFAULT_STATE_ROOT,
            extrinsics_root=DEFAULT_EXTRINSICS_ROOT,
            digest=DEFAULT_DIGEST,
            input_amount=amt_in,
            zk_tree_root=root,
            siblings=[list(lvl) for lvl in proof.siblings],
            positions=list(proof.positions),
        )
        out.append(CircuitInputs(public=public, private=private))
    return out
