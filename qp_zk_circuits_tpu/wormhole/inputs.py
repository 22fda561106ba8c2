"""Public-input types and layout for Wormhole proofs.

Engine-free module (no JAX import), mirroring the reference's plonky2-free
`qp-wormhole-inputs` crate (`wormhole/inputs/src/lib.rs`): the 21-felt leaf
PI layout, aggregated-PI layouts, index constants, parsers with structural
validation, and the MAX_PROOF_COUNT policy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

DIGEST_BYTES_LEN = 32
GOLDILOCKS_ORDER = 0xFFFFFFFF00000001

# Leaf PI layout (reference `inputs/src/lib.rs:25-33`):
# asset_id(1) + output_amount_1(1) + output_amount_2(1) + volume_fee_bps(1) +
# nullifier(4) + exit_account_1(4) + exit_account_2(4) + block_hash(4) + block_number(1)
PUBLIC_INPUTS_FELTS_LEN = 21
MIN_LEAF_SECURITY_BITS = 100
MAX_PROOF_COUNT = 64

ASSET_ID_INDEX = 0
OUTPUT_AMOUNT_1_INDEX = 1
OUTPUT_AMOUNT_2_INDEX = 2
VOLUME_FEE_BPS_INDEX = 3
NULLIFIER_START_INDEX = 4
NULLIFIER_END_INDEX = 8
EXIT_ACCOUNT_1_START_INDEX = 8
EXIT_ACCOUNT_1_END_INDEX = 12
EXIT_ACCOUNT_2_START_INDEX = 12
EXIT_ACCOUNT_2_END_INDEX = 16
BLOCK_HASH_START_INDEX = 16
BLOCK_HASH_END_INDEX = 20
BLOCK_NUMBER_INDEX = 20


class InputsError(ValueError):
    pass


def validate_proof_count(count: int, label: str) -> None:
    """Canonical 1..=MAX_PROOF_COUNT bound, applied before any size-scaled work
    (reference `inputs/src/lib.rs:46-65`)."""
    if count <= 0:
        raise InputsError(f"{label} must be > 0")
    if count > MAX_PROOF_COUNT:
        raise InputsError(f"{label} ({count}) exceeds maximum allowed ({MAX_PROOF_COUNT})")


class BytesDigest(bytes):
    """A 32-byte digest whose 8-byte LE limbs are canonical felts.

    Validating at construction kills the `{v, v+p}` byte-alias class
    (reference `inputs/src/lib.rs:148-168`)."""

    def __new__(cls, data: bytes):
        if len(data) != DIGEST_BYTES_LEN:
            raise InputsError(f"digest must be {DIGEST_BYTES_LEN} bytes, got {len(data)}")
        for i in range(4):
            v = int.from_bytes(data[8 * i : 8 * i + 8], "little")
            if v >= GOLDILOCKS_ORDER:
                raise InputsError(f"digest chunk {i} out of field range: {v}")
        return super().__new__(cls, data)

    @classmethod
    def new_unchecked(cls, data: bytes) -> "BytesDigest":
        """Skip canonicality validation (4-bytes/felt u32-chunk uses)."""
        obj = bytes.__new__(cls, data)
        if len(data) != DIGEST_BYTES_LEN:
            raise InputsError("digest must be 32 bytes")
        return obj

    @classmethod
    def zero(cls) -> "BytesDigest":
        return cls(b"\x00" * 32)

    def to_felts(self) -> np.ndarray:
        arr = np.frombuffer(self, dtype="<u8").astype(np.uint64)
        return arr

    @classmethod
    def from_felts(cls, felts) -> "BytesDigest":
        felts = np.asarray(felts, dtype=np.uint64)
        if felts.shape != (4,):
            raise InputsError(f"expected 4 felts, got {felts.shape}")
        return cls(felts.astype("<u8").tobytes())

    def __repr__(self):
        return f"BytesDigest(0x{self.hex()})"


def _u32(v: int, name: str) -> int:
    v = int(v)
    if v < 0 or v > 0xFFFFFFFF:
        raise InputsError(f"failed to convert {name} to u32: {v}")
    return v


@dataclass(frozen=True)
class PublicCircuitInputs:
    """All public inputs of a single Wormhole leaf proof."""

    asset_id: int
    output_amount_1: int
    output_amount_2: int
    volume_fee_bps: int
    nullifier: BytesDigest
    exit_account_1: BytesDigest
    exit_account_2: BytesDigest
    block_hash: BytesDigest
    block_number: int

    @classmethod
    def from_felts(cls, pis) -> "PublicCircuitInputs":
        pis = np.asarray(pis, dtype=np.uint64)
        if pis.shape != (PUBLIC_INPUTS_FELTS_LEN,):
            raise InputsError(
                f"public inputs should contain {PUBLIC_INPUTS_FELTS_LEN} field elements, got {pis.shape}"
            )
        return cls(
            asset_id=_u32(pis[ASSET_ID_INDEX], "asset_id"),
            output_amount_1=_u32(pis[OUTPUT_AMOUNT_1_INDEX], "output_amount_1"),
            output_amount_2=_u32(pis[OUTPUT_AMOUNT_2_INDEX], "output_amount_2"),
            volume_fee_bps=_u32(pis[VOLUME_FEE_BPS_INDEX], "volume_fee_bps"),
            nullifier=BytesDigest.from_felts(pis[NULLIFIER_START_INDEX:NULLIFIER_END_INDEX]),
            exit_account_1=BytesDigest.from_felts(
                pis[EXIT_ACCOUNT_1_START_INDEX:EXIT_ACCOUNT_1_END_INDEX]
            ),
            exit_account_2=BytesDigest.from_felts(
                pis[EXIT_ACCOUNT_2_START_INDEX:EXIT_ACCOUNT_2_END_INDEX]
            ),
            block_hash=BytesDigest.from_felts(pis[BLOCK_HASH_START_INDEX:BLOCK_HASH_END_INDEX]),
            block_number=_u32(pis[BLOCK_NUMBER_INDEX], "block_number"),
        )

    def to_felts(self) -> np.ndarray:
        out = np.zeros(PUBLIC_INPUTS_FELTS_LEN, dtype=np.uint64)
        out[ASSET_ID_INDEX] = self.asset_id
        out[OUTPUT_AMOUNT_1_INDEX] = self.output_amount_1
        out[OUTPUT_AMOUNT_2_INDEX] = self.output_amount_2
        out[VOLUME_FEE_BPS_INDEX] = self.volume_fee_bps
        out[NULLIFIER_START_INDEX:NULLIFIER_END_INDEX] = self.nullifier.to_felts()
        out[EXIT_ACCOUNT_1_START_INDEX:EXIT_ACCOUNT_1_END_INDEX] = self.exit_account_1.to_felts()
        out[EXIT_ACCOUNT_2_START_INDEX:EXIT_ACCOUNT_2_END_INDEX] = self.exit_account_2.to_felts()
        out[BLOCK_HASH_START_INDEX:BLOCK_HASH_END_INDEX] = self.block_hash.to_felts()
        out[BLOCK_NUMBER_INDEX] = self.block_number
        return out

    @property
    def is_dummy(self) -> bool:
        """The dummy sentinel: zero block hash AND zero outputs (reference
        `circuit/src/circuit.rs:257-286`)."""
        return (
            self.block_hash == BytesDigest.zero()
            and self.output_amount_1 == 0
            and self.output_amount_2 == 0
        )


@dataclass(frozen=True)
class PublicInputsByAccount:
    summed_output_amount: int
    exit_account: BytesDigest


@dataclass(frozen=True)
class BlockData:
    block_hash: BytesDigest
    block_number: int


@dataclass(frozen=True)
class PrivateBatchPublicInputs:
    """Aggregated (deduped) private-batch PIs.

    Layout (reference `aggregator/src/private_batch/circuit/constants.rs:47-95`):
    [num_exit_slots, asset_id, volume_fee_bps, block_hash(4), block_number,
     (sum, exit_account(4)) * 2N, nullifier(4) * N, zero padding]
    total length = 21*N + 8.
    """

    num_exit_slots: int
    asset_id: int
    volume_fee_bps: int
    block_data: BlockData
    account_data: tuple
    nullifiers: tuple

    HEADER_LEN = 8

    @staticmethod
    def pi_len(n_leaf: int) -> int:
        return PUBLIC_INPUTS_FELTS_LEN * n_leaf + 8

    @classmethod
    def from_felts(cls, pis) -> "PrivateBatchPublicInputs":
        pis = np.asarray(pis, dtype=np.uint64)
        if len(pis) < 8:
            raise InputsError("AggregatedPI: too few elements, need at least 8 for header")
        payload = len(pis) - 8
        if payload % PUBLIC_INPUTS_FELTS_LEN != 0:
            raise InputsError(
                f"AggregatedPI: malformed length {len(pis)} — expected 8 + N*{PUBLIC_INPUTS_FELTS_LEN}"
            )
        n_leaf = payload // PUBLIC_INPUTS_FELTS_LEN
        validate_proof_count(n_leaf, "AggregatedPI: n_leaf")
        num_exit_slots = _u32(pis[0], "num_exit_slots")
        if num_exit_slots != 2 * n_leaf:
            raise InputsError(
                f"AggregatedPI: num_exit_slots is {num_exit_slots}, layout implies {2 * n_leaf}"
            )
        asset_id = _u32(pis[1], "asset_id")
        fee = _u32(pis[2], "volume_fee_bps")
        block = BlockData(BytesDigest.from_felts(pis[3:7]), _u32(pis[7], "block_number"))
        cursor = 8
        accounts = []
        for _ in range(2 * n_leaf):
            amt = _u32(pis[cursor], "summed_output_amount")
            acct = BytesDigest.from_felts(pis[cursor + 1 : cursor + 5])
            accounts.append(PublicInputsByAccount(amt, acct))
            cursor += 5
        nullifiers = []
        for _ in range(n_leaf):
            nullifiers.append(BytesDigest.from_felts(pis[cursor : cursor + 4]))
            cursor += 4
        if np.any(pis[cursor:]):
            raise InputsError("AggregatedPI: nonzero padding")
        return cls(
            num_exit_slots=num_exit_slots,
            asset_id=asset_id,
            volume_fee_bps=fee,
            block_data=block,
            account_data=tuple(accounts),
            nullifiers=tuple(nullifiers),
        )


class public_batch_pi:
    """Public-batch PI layout constants (reference `inputs/src/lib.rs:286-344`)."""

    AGGREGATOR_ADDRESS_LEN = 4
    HEADER_LEN = 12  # addr(4) + asset(1) + fee(1) + block_hash(4) + bn(1) + total_slots(1)
    EXIT_SLOT_LEN = 5

    @staticmethod
    def exit_slots_per_inner(num_leaf_proofs: int) -> int:
        return num_leaf_proofs * 2

    @staticmethod
    def nullifiers_per_inner(num_leaf_proofs: int) -> int:
        return num_leaf_proofs

    @classmethod
    def pi_len(cls, num_private_batch_proofs: int, num_leaf_proofs: int) -> int:
        return (
            cls.HEADER_LEN
            + num_private_batch_proofs * cls.exit_slots_per_inner(num_leaf_proofs) * cls.EXIT_SLOT_LEN
            + num_private_batch_proofs * cls.nullifiers_per_inner(num_leaf_proofs) * 4
        )


@dataclass(frozen=True)
class PublicBatchPublicInputs:
    """Order-preserving flattened PIs of the public-batch layer."""

    aggregator_address: BytesDigest
    asset_id: int
    volume_fee_bps: int
    block_data: BlockData
    total_exit_slots: int
    account_data: tuple
    nullifiers: tuple

    @classmethod
    def from_felts(cls, pis, num_private_batch_proofs: int, num_leaf_proofs: int):
        pis = np.asarray(pis, dtype=np.uint64)
        validate_proof_count(num_private_batch_proofs, "PublicBatchPI: num_private_batch_proofs")
        validate_proof_count(num_leaf_proofs, "PublicBatchPI: num_leaf_proofs")
        want = public_batch_pi.pi_len(num_private_batch_proofs, num_leaf_proofs)
        if len(pis) != want:
            raise InputsError(f"PublicBatchPI: expected {want} felts, got {len(pis)}")
        addr = BytesDigest.from_felts(pis[0:4])
        asset_id = _u32(pis[4], "asset_id")
        fee = _u32(pis[5], "volume_fee_bps")
        block = BlockData(BytesDigest.from_felts(pis[6:10]), _u32(pis[10], "block_number"))
        total_slots = _u32(pis[11], "total_exit_slots")
        slots = num_private_batch_proofs * public_batch_pi.exit_slots_per_inner(num_leaf_proofs)
        if total_slots != slots:
            raise InputsError(
                f"PublicBatchPI: total_exit_slots {total_slots} != layout-implied {slots}"
            )
        cursor = 12
        accounts = []
        for _ in range(slots):
            amt = _u32(pis[cursor], "summed_output_amount")
            acct = BytesDigest.from_felts(pis[cursor + 1 : cursor + 5])
            accounts.append(PublicInputsByAccount(amt, acct))
            cursor += 5
        nulls = []
        for _ in range(num_private_batch_proofs * num_leaf_proofs):
            nulls.append(BytesDigest.from_felts(pis[cursor : cursor + 4]))
            cursor += 4
        return cls(
            aggregator_address=addr,
            asset_id=asset_id,
            volume_fee_bps=fee,
            block_data=block,
            total_exit_slots=total_slots,
            account_data=tuple(accounts),
            nullifiers=tuple(nulls),
        )
