"""The Wormhole leaf circuit: 5 fragments + shared-target glue.

Port of reference `wormhole/circuit/src/` (circuit.rs, zk_merkle_proof.rs,
nullifier.rs, unspendable_account.rs, block_header/, substrate_account.rs)
onto our TPU-native PLONK builder. Public-input order is the wire format to
the chain and matches the reference exactly (21 felts — `inputs/src/lib.rs`):

  asset_id(0) out1(1) out2(2) fee_bps(3) nullifier(4..8) exit1(8..12)
  exit2(12..16) block_hash(16..20) block_number(20)

Constraint census mirrored fragment by fragment:
  * ZkMerkleProof: 32-bit range checks, fee constraint
    (out1+out2)*10000 <= input*(10000-fee) via 14/48-bit range checks,
    fixed-capacity 4-ary walk padded to MAX_DEPTH=16 with active-level
    selects and 2-bit position hints (`zk_merkle_proof.rs:481-625`);
  * Nullifier / UnspendableAccount: double Poseidon2 over salted preimages
    (`nullifier.rs:284-300`, `unspendable_account.rs:215-237`);
  * BlockHeader: 45-felt preimage hash + 32-bit block_number check
    (`block_header/mod.rs:60-108`);
  * DualExitAccount: unconstrained public inputs (constrained only at the
    private-batch layer — `substrate_account.rs:144-166`);
  * Shared glue: secret equality, in-circuit dummy detection
    (block_hash == 0 AND out1 == 0 AND out2 == 0), conditional nullifier /
    block-hash / root bindings x is_not_dummy (`circuit.rs:233-323`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder, PartialWitness
from ..utils import gadgets as gd
from ..utils import serialization as sz
from ..utils.config_policy import validate_circuit_config, wormhole_leaf_circuit_config
from . import inputs as wi
from .circuit_inputs import (
    DIGEST_LOGS_FELTS,
    MAX_DEPTH,
    NULLIFIER_SALT,
    SIBLINGS_PER_LEVEL,
    UNSPENDABLE_SALT,
    CircuitInputs,
    HeaderInputs,
    nullifier_from_preimage,
    unspendable_account_from_secret,
)

NUM_LEAF_FELTS = 8  # to(4) + tc(2) + asset(1) + amount(1)
_DEPTH_N_LOG = 5  # bit width for depth comparisons (MAX_DEPTH = 16)


# ---------------------------------------------------------------------------
# targets


@dataclass
class ZkLeafTargets:
    to_account: list
    transfer_count: list
    asset_id: int
    input_amount: int
    output_amount_1: int
    output_amount_2: int
    volume_fee_bps: int

    @classmethod
    def new(cls, b: CircuitBuilder) -> "ZkLeafTargets":
        # public inputs registered first: asset_id is PI index 0
        asset_id = b.add_virtual_target()
        out1 = b.add_virtual_target()
        out2 = b.add_virtual_target()
        fee = b.add_virtual_target()
        b.register_public_inputs([asset_id, out1, out2, fee])
        return cls(
            to_account=b.add_virtual_targets(4),
            transfer_count=b.add_virtual_targets(2),
            asset_id=asset_id,
            input_amount=b.add_virtual_target(),
            output_amount_1=out1,
            output_amount_2=out2,
            volume_fee_bps=fee,
        )

    def collect_for_hash(self) -> list:
        return (
            list(self.to_account)
            + list(self.transfer_count)
            + [self.asset_id, self.input_amount]
        )

    def collect_32_bit_targets(self) -> list:
        return list(self.transfer_count) + [
            self.asset_id,
            self.input_amount,
            self.output_amount_1,
            self.output_amount_2,
            self.volume_fee_bps,
        ]


@dataclass
class ZkMerkleProofTargets:
    root_hash: list
    depth: int
    siblings: list  # [MAX_DEPTH][3][4]
    positions: list  # [MAX_DEPTH]
    leaf: ZkLeafTargets
    is_not_dummy: int

    @classmethod
    def new(cls, b: CircuitBuilder) -> "ZkMerkleProofTargets":
        leaf = ZkLeafTargets.new(b)
        return cls(
            root_hash=b.add_virtual_hash(),
            depth=b.add_virtual_target(),
            siblings=[
                [b.add_virtual_hash() for _ in range(SIBLINGS_PER_LEVEL)]
                for _ in range(MAX_DEPTH)
            ],
            positions=b.add_virtual_targets(MAX_DEPTH),
            leaf=leaf,
            is_not_dummy=b.add_virtual_bool_target_safe(),
        )


@dataclass
class NullifierTargets:
    hash: list
    secret: list
    transfer_count: list

    @classmethod
    def new(cls, b: CircuitBuilder) -> "NullifierTargets":
        h = b.add_virtual_hash()
        b.register_public_inputs(h)  # PI 4..8
        return cls(hash=h, secret=b.add_virtual_hash(), transfer_count=b.add_virtual_targets(2))


@dataclass
class UnspendableAccountTargets:
    account_id: list
    secret: list

    @classmethod
    def new(cls, b: CircuitBuilder) -> "UnspendableAccountTargets":
        return cls(account_id=b.add_virtual_hash(), secret=b.add_virtual_hash())


@dataclass
class DualExitAccountTargets:
    exit_account_1: list
    exit_account_2: list

    @classmethod
    def new(cls, b: CircuitBuilder) -> "DualExitAccountTargets":
        e1 = b.add_virtual_hash()
        b.register_public_inputs(e1)  # PI 8..12
        e2 = b.add_virtual_hash()
        b.register_public_inputs(e2)  # PI 12..16
        return cls(exit_account_1=e1, exit_account_2=e2)


@dataclass
class HeaderTargets:
    parent_hash: list
    block_number: int
    state_root: list
    extrinsics_root: list
    zk_tree_root: list
    digest: list

    @classmethod
    def new(cls, b: CircuitBuilder) -> "HeaderTargets":
        bn = b.add_virtual_target()
        b.register_public_input(bn)  # PI 20
        return cls(
            parent_hash=b.add_virtual_hash(),
            block_number=bn,
            state_root=b.add_virtual_hash(),
            extrinsics_root=b.add_virtual_hash(),
            zk_tree_root=b.add_virtual_hash(),
            digest=b.add_virtual_targets(DIGEST_LOGS_FELTS),
        )

    def collect_to_vec(self) -> list:
        return (
            list(self.parent_hash)
            + [self.block_number]
            + list(self.state_root)
            + list(self.extrinsics_root)
            + list(self.zk_tree_root)
            + list(self.digest)
        )


@dataclass
class BlockHeaderTargets:
    block_hash: list
    header: HeaderTargets

    @classmethod
    def new(cls, b: CircuitBuilder) -> "BlockHeaderTargets":
        bh = b.add_virtual_hash()
        b.register_public_inputs(bh)  # PI 16..20
        return cls(block_hash=bh, header=HeaderTargets.new(b))


@dataclass
class CircuitTargets:
    nullifier: NullifierTargets
    unspendable_account: UnspendableAccountTargets
    zk_merkle_proof: ZkMerkleProofTargets
    exit_accounts: DualExitAccountTargets
    block_header: BlockHeaderTargets

    @classmethod
    def new(cls, b: CircuitBuilder) -> "CircuitTargets":
        # zk_merkle_proof first: asset_id must be PI index 0 (circuit.rs:44-55)
        zk = ZkMerkleProofTargets.new(b)
        return cls(
            nullifier=NullifierTargets.new(b),
            unspendable_account=UnspendableAccountTargets.new(b),
            zk_merkle_proof=zk,
            exit_accounts=DualExitAccountTargets.new(b),
            block_header=BlockHeaderTargets.new(b),
        )


# ---------------------------------------------------------------------------
# fragment circuits


def _salt_constants(b: CircuitBuilder, salt: str) -> list:
    return [b.constant(int(f)) for f in sz.string_to_felts(salt)]


def nullifier_circuit_conditional(b: CircuitBuilder, t: NullifierTargets, is_not_dummy: int):
    pre = _salt_constants(b, NULLIFIER_SALT) + list(t.secret) + list(t.transfer_count)
    inner = b.hash_n_to_hash_no_pad(pre)
    outer = b.hash_n_to_hash_no_pad(inner)
    for i in range(4):
        diff = b.sub(t.hash[i], outer[i])
        b.assert_zero(b.mul(diff, is_not_dummy))


def unspendable_account_circuit(b: CircuitBuilder, t: UnspendableAccountTargets):
    pre = _salt_constants(b, UNSPENDABLE_SALT) + list(t.secret)
    inner = b.hash_n_to_hash_no_pad(pre)
    outer = b.hash_n_to_hash_no_pad(inner)
    for i in range(4):
        b.connect(outer[i], t.account_id[i])


def block_header_circuit_without_hash_binding(b: CircuitBuilder, t: BlockHeaderTargets):
    b.range_check(t.header.block_number, 32)


def block_header_conditional_binding(b: CircuitBuilder, t: BlockHeaderTargets, is_not_dummy: int):
    computed = b.hash_n_to_hash_no_pad(t.header.collect_to_vec())
    for i in range(4):
        diff = b.sub(t.block_hash[i], computed[i])
        b.assert_zero(b.mul(diff, is_not_dummy))


def zk_merkle_proof_circuit(b: CircuitBuilder, t: ZkMerkleProofTargets):
    # 32-bit range checks on the leaf scalars
    for target in t.leaf.collect_32_bit_targets():
        b.range_check(target, 32)

    # fee constraint: (out1 + out2) * 10000 <= input * (10000 - fee_bps)
    ten_thousand = b.constant(10000)
    total_output = b.add(t.leaf.output_amount_1, t.leaf.output_amount_2)
    lhs = b.mul(total_output, ten_thousand)
    fee_complement = b.sub(ten_thousand, t.leaf.volume_fee_bps)
    b.range_check(fee_complement, 14)
    rhs = b.mul(t.leaf.input_amount, fee_complement)
    diff = b.sub(rhs, lhs)
    b.range_check(diff, 48)

    # leaf hash
    current = b.hash_n_to_hash_no_pad(t.leaf.collect_for_hash())

    # depth <= MAX_DEPTH
    gd.enforce_target_less_than_const(b, t.depth, MAX_DEPTH + 1, _DEPTH_N_LOG)

    zero = b.zero()
    one = b.one()
    two = b.constant(2)
    three = b.constant(3)
    for level in range(MAX_DEPTH):
        is_active = gd.is_const_less_than(b, level, t.depth, _DEPTH_N_LOG)
        sibs = t.siblings[level]
        pos = t.positions[level]
        b.range_check(pos, 2)
        pos_is_0 = b.is_equal(pos, zero)
        pos_is_1 = b.is_equal(pos, one)
        pos_is_2 = b.is_equal(pos, two)
        pos_is_3 = b.is_equal(pos, three)
        children = []
        for slot in range(4):
            elems = []
            for e in range(4):
                if slot == 0:
                    v = b.select(pos_is_0, current[e], sibs[0][e])
                elif slot == 1:
                    nc = b.select(pos_is_0, sibs[0][e], sibs[1][e])
                    v = b.select(pos_is_1, current[e], nc)
                elif slot == 2:
                    pos_le_1 = b.or_(pos_is_0, pos_is_1)
                    nc = b.select(pos_le_1, sibs[1][e], sibs[2][e])
                    v = b.select(pos_is_2, current[e], nc)
                else:
                    v = b.select(pos_is_3, current[e], sibs[2][e])
                elems.append(v)
            children.append(elems)
        preimage = [e for child in children for e in child]  # 16 felts
        parent = b.hash_n_to_hash_no_pad(preimage)
        current = [b.select(is_active, parent[i], current[i]) for i in range(4)]

    # root equality x is_not_dummy
    for i in range(4):
        diff = b.sub(current[i], t.root_hash[i])
        b.assert_zero(b.mul(diff, t.is_not_dummy))


def connect_shared_targets(b: CircuitBuilder, t: CircuitTargets):
    # secret equality across fragments
    b.connect_hashes(t.nullifier.secret, t.unspendable_account.secret)
    for a, c in zip(t.nullifier.transfer_count, t.zk_merkle_proof.leaf.transfer_count):
        b.connect(a, c)
    # to_account == unspendable account id
    for a, c in zip(t.unspendable_account.account_id, t.zk_merkle_proof.leaf.to_account):
        b.connect(a, c)

    # in-circuit dummy detection: block_hash == 0 AND out1 == 0 AND out2 == 0
    zero = b.zero()
    bh = t.block_header.block_hash
    bh_zero = [b.is_equal(bh[i], zero) for i in range(4)]
    block_hash_is_zero = b.and_(b.and_(bh_zero[0], bh_zero[1]), b.and_(bh_zero[2], bh_zero[3]))
    leaf = t.zk_merkle_proof.leaf
    out1_zero = b.is_equal(leaf.output_amount_1, zero)
    out2_zero = b.is_equal(leaf.output_amount_2, zero)
    is_dummy = b.and_(block_hash_is_zero, b.and_(out1_zero, out2_zero))
    is_not_dummy = b.sub(b.one(), is_dummy)
    b.connect(t.zk_merkle_proof.is_not_dummy, is_not_dummy)

    nullifier_circuit_conditional(b, t.nullifier, is_not_dummy)
    block_header_conditional_binding(b, t.block_header, is_not_dummy)

    # zk_tree_root == merkle root, x is_not_dummy (the critical binding)
    for i in range(4):
        diff = b.sub(t.block_header.header.zk_tree_root[i], t.zk_merkle_proof.root_hash[i])
        b.assert_zero(b.mul(diff, is_not_dummy))


class WormholeCircuit:
    """The leaf circuit shell: compose fragments, build circuit data.

    Deliberately NO full-CircuitData deserializer (the reference refuses to
    load prover data from disk — poisoned-artifact exfiltration rationale,
    `circuit.rs:5-16`): circuits are always rebuilt from source."""

    def __init__(self, config=None):
        config = config or wormhole_leaf_circuit_config()
        validate_circuit_config(config)
        self.builder = CircuitBuilder(config)
        self.targets = CircuitTargets.new(self.builder)
        unspendable_account_circuit(self.builder, self.targets.unspendable_account)
        zk_merkle_proof_circuit(self.builder, self.targets.zk_merkle_proof)
        # exit accounts: no constraints (public inputs only)
        block_header_circuit_without_hash_binding(self.builder, self.targets.block_header)
        connect_shared_targets(self.builder, self.targets)

    def build(self, shape_only: bool = False):
        return self.builder.build(shape_only=shape_only)

    def num_gates(self) -> int:
        return self.builder.num_gates()


def fill_witness(pw: PartialWitness, inputs: CircuitInputs, t: CircuitTargets) -> None:
    """Shared witness fill (used by the prover and dummy-proof generation —
    reference `prover/src/lib.rs:187-221`)."""
    if len(inputs.private.siblings) > MAX_DEPTH:
        raise ValueError(
            f"proof depth {len(inputs.private.siblings)} exceeds MAX_DEPTH {MAX_DEPTH}"
        )
    pub = inputs.public
    priv = inputs.private

    # leaf
    leaf = t.zk_merkle_proof.leaf
    acct_felts = sz.bytes_to_digest(priv.unspendable_account)
    pw.set_many(leaf.to_account, acct_felts)
    pw.set_many(leaf.transfer_count, sz.u64_to_felts(priv.transfer_count))
    pw.set_target(leaf.asset_id, pub.asset_id)
    pw.set_target(leaf.input_amount, priv.input_amount)
    pw.set_target(leaf.output_amount_1, pub.output_amount_1)
    pw.set_target(leaf.output_amount_2, pub.output_amount_2)
    pw.set_target(leaf.volume_fee_bps, pub.volume_fee_bps)

    # merkle proof (padded)
    zk = t.zk_merkle_proof
    pw.set_target(zk.depth, len(priv.siblings))
    pw.set_many(zk.root_hash, sz.bytes_to_digest(priv.zk_tree_root))
    for level in range(MAX_DEPTH):
        if level < len(priv.siblings):
            sibs = priv.siblings[level]
            pos = priv.positions[level]
        else:
            sibs = [b"\x00" * 32] * SIBLINGS_PER_LEVEL
            pos = 0
        for j in range(SIBLINGS_PER_LEVEL):
            pw.set_many(zk.siblings[level][j], sz.bytes_to_digest(sibs[j]))
        pw.set_target(zk.positions[level], pos)

    # nullifier
    secret_felts = priv.secret.expose_felts()
    nullifier_felts = nullifier_from_preimage(priv.secret, priv.transfer_count)
    pw.set_many(t.nullifier.hash, sz.bytes_to_digest(bytes(pub.nullifier)))
    pw.set_many(t.nullifier.secret, secret_felts)
    pw.set_many(t.nullifier.transfer_count, sz.u64_to_felts(priv.transfer_count))

    # unspendable account
    pw.set_many(t.unspendable_account.account_id, acct_felts)
    pw.set_many(t.unspendable_account.secret, secret_felts)

    # exit accounts
    pw.set_many(t.exit_accounts.exit_account_1, sz.bytes_to_digest(bytes(pub.exit_account_1)))
    pw.set_many(t.exit_accounts.exit_account_2, sz.bytes_to_digest(bytes(pub.exit_account_2)))

    # block header
    header = HeaderInputs.new(
        priv.parent_hash,
        pub.block_number,
        priv.state_root,
        priv.extrinsics_root,
        priv.zk_tree_root,
        priv.digest,
    )
    bt = t.block_header
    pw.set_many(bt.block_hash, sz.bytes_to_digest(bytes(pub.block_hash)))
    pw.set_many(bt.header.parent_hash, header.parent_hash)
    pw.set_target(bt.header.block_number, header.block_number)
    pw.set_many(bt.header.state_root, header.state_root)
    pw.set_many(bt.header.extrinsics_root, header.extrinsics_root)
    pw.set_many(bt.header.zk_tree_root, header.zk_tree_root)
    pw.set_many(bt.header.digest, header.digest)
