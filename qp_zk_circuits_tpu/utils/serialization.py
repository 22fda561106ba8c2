"""Byte <-> felt serialization, mirroring reference `common/src/serialization.rs`.

Two encodings (reference lines 133-247):
  * **4 bytes/felt + 0x01 terminator** — injective on arbitrary byte strings
    (`bytes_to_felts` / `felts_to_bytes`); each felt is a u32 limb.
  * **8 bytes/felt compact** — full-width limbs, zero-padded; injective only
    on 8-byte-aligned canonical input, so `hash_bytes_compact` rejects
    unaligned input and non-canonical (>= p) limbs (the audit-pinned
    `{v, v+p}` alias class — reference `serialization.rs:209-218` and
    `encoding_safety.rs`).

Digests: 4 felts <-> 32 bytes little-endian (8 bytes per felt).
Integers: u64 -> [hi32, lo32]; u128 -> four 32-bit limbs, most significant
first. Amounts quantize by 10^10 (0.01 units at 12 on-chain decimals —
reference `inputs/src/lib.rs` DEV NOTE + `PublicCircuitInputs` docs).
"""

from __future__ import annotations

import numpy as np

from ..field import gf_np as F
from ..hash import poseidon2 as ps

P = 0xFFFFFFFF00000001

MAX_SERIALIZED_BYTES = 1 << 20  # 1 MiB input cap (audit #97066 analogue)
BYTES_PER_FELT = 4
FELTS_PER_U64 = 2
FELTS_PER_U128 = 4
POSEIDON2_OUTPUT = 4
MAX_SERIALIZED_FELTS = (MAX_SERIALIZED_BYTES + BYTES_PER_FELT) // BYTES_PER_FELT
AMOUNT_QUANTIZATION_FACTOR = 10**10
_MASK32 = 0xFFFFFFFF


class SerializationError(ValueError):
    pass


# ---------------------------------------------------------------------------
# 4 bytes/felt + terminator


def bytes_to_felts(data: bytes) -> np.ndarray:
    """Injective variable-length encoding: append 0x01, zero-pad to 4-byte
    chunks, each chunk a little-endian u32 felt."""
    if len(data) > MAX_SERIALIZED_BYTES:
        raise SerializationError("bytes_to_felts: input exceeds maximum serialized length")
    buf = bytes(data) + b"\x01"
    pad = (-len(buf)) % 4
    buf += b"\x00" * pad
    arr = np.frombuffer(buf, dtype="<u4").astype(np.uint64)
    return arr


def felts_to_bytes(felts) -> bytes:
    """Inverse of bytes_to_felts; validates limb range and terminator."""
    felts = np.asarray(felts, dtype=np.uint64)
    if len(felts) > MAX_SERIALIZED_FELTS:
        raise SerializationError("felts_to_bytes: input exceeds maximum serialized length")
    if np.any(felts > np.uint64(_MASK32)):
        raise SerializationError("felts_to_bytes: felt exceeds 32-bit limb size")
    buf = felts.astype("<u4").tobytes()
    end = len(buf)
    while end > 0 and buf[end - 1] == 0:
        end -= 1
    if end == 0 or buf[end - 1] != 1:
        raise SerializationError("felts_to_bytes: missing terminator marker")
    return buf[: end - 1]


def string_to_felts(s: str) -> np.ndarray:
    return bytes_to_felts(s.encode("utf-8"))


# ---------------------------------------------------------------------------
# compact 8 bytes/felt


def bytes_to_felts_compact(data: bytes, reject_noncanonical: bool = True) -> np.ndarray:
    """Full-width limbs, zero-padded to 8 bytes. Lossy on unaligned input —
    see hash_bytes_compact for the collision-resistant wrapper."""
    if len(data) > MAX_SERIALIZED_BYTES:
        raise SerializationError("bytes_to_felts_compact: input exceeds maximum length")
    pad = (-len(data)) % 8
    buf = bytes(data) + b"\x00" * pad
    arr = np.frombuffer(buf, dtype="<u8").astype(np.uint64)
    if reject_noncanonical and np.any(arr >= np.uint64(P)):
        raise SerializationError(
            "bytes_to_felts_compact: limb >= Goldilocks modulus (non-canonical alias)"
        )
    return arr


def hash_bytes_compact(data: bytes) -> bytes:
    """Poseidon2 10*-padded sponge over the compact encoding.

    Enforces 8-byte alignment and canonical limbs so the encoding is injective
    on the accepted domain (reference `serialization.rs:187-218`)."""
    if len(data) > MAX_SERIALIZED_BYTES:
        raise SerializationError("hash_bytes_compact: input exceeds maximum length")
    if len(data) % 8 != 0:
        raise SerializationError("hash_bytes_compact: input length must be a multiple of 8")
    felts = bytes_to_felts_compact(data, reject_noncanonical=True)
    return digest_to_bytes(ps.hash_padded(felts))


# ---------------------------------------------------------------------------
# digests


def digest_to_bytes(digest) -> bytes:
    """4 felts -> 32 bytes, 8 bytes little-endian per felt."""
    digest = np.asarray(digest, dtype=np.uint64)
    assert digest.shape == (POSEIDON2_OUTPUT,)
    return digest.astype("<u8").tobytes()


def bytes_to_digest(data: bytes) -> np.ndarray:
    """32 bytes -> 4 felts (lazy reduction semantics: value taken mod p)."""
    if len(data) != 32:
        raise SerializationError(f"bytes_to_digest: expected 32 bytes, got {len(data)}")
    arr = np.frombuffer(bytes(data), dtype="<u8").astype(np.uint64)
    return F.from_noncanonical_u64(arr)


# ---------------------------------------------------------------------------
# integers


def u64_to_felts(num: int) -> np.ndarray:
    """u64 -> [hi32, lo32] (most-significant limb first, reference order)."""
    num = int(num)
    return np.array([(num >> 32) & _MASK32, num & _MASK32], dtype=np.uint64)


def felts_to_u64(felts) -> int:
    felts = np.asarray(felts, dtype=np.uint64)
    vals = [int(v) for v in felts]
    if any(v > _MASK32 for v in vals):
        raise SerializationError("felts_to_u64: felt exceeds 32-bit limb size")
    return (vals[0] << 32) | vals[1]


def u128_to_felts(num: int) -> np.ndarray:
    num = int(num)
    return np.array(
        [(num >> (96 - 32 * i)) & _MASK32 for i in range(4)], dtype=np.uint64
    )


def felts_to_u128(felts) -> int:
    felts = np.asarray(felts, dtype=np.uint64)
    vals = [int(v) for v in felts]
    if any(v > _MASK32 for v in vals):
        raise SerializationError("felts_to_u128: felt exceeds 32-bit limb size")
    out = 0
    for i, v in enumerate(vals):
        out |= v << (96 - 32 * i)
    return out


def u128_to_quantized_felt(num: int) -> int:
    """Quantize a u128 amount to one 32-bit-limb felt (errors if oversized —
    amounts are attacker-controlled, reference `serialization.rs:70-95`)."""
    q = int(num) // AMOUNT_QUANTIZATION_FACTOR
    if q > _MASK32:
        raise SerializationError(f"quantized value {q} exceeds 32-bit limb size")
    return q


def quantized_felt_to_u128(felt: int) -> int:
    v = int(felt)
    if v > _MASK32:
        raise SerializationError("felt exceeds 32-bit limb size")
    return v * AMOUNT_QUANTIZATION_FACTOR
