"""Secret hygiene: move-only spend-secret container with explicit exposure.

Port of reference `wormhole/circuit/src/sensitive.rs` adapted to Python
reality: the secret bytes live in a single mutable numpy buffer that is
volatile-scrubbed on `scrub()` / garbage collection, equality is
constant-time XOR-accumulate, `repr` is redacted, and every read happens
through an explicit `expose_*` method. (Python cannot guarantee that
interpreter-level copies never happen — e.g. int boxing during hashing — so,
as in the reference, the guarantee is best-effort scrubbing of the owned
buffers plus no accidental display/logging.)
"""

from __future__ import annotations

import numpy as np

from ..utils import serialization as sz

SECRET_LEN = 32


class Secret:
    """A 32-byte spend secret (digest-validated limbs)."""

    __slots__ = ("_buf", "_scrubbed")

    def __init__(self, data: bytes):
        if len(data) != SECRET_LEN:
            raise ValueError(f"secret must be {SECRET_LEN} bytes")
        # validate canonical 8-byte limbs (same domain as BytesDigest)
        for i in range(4):
            v = int.from_bytes(data[8 * i : 8 * i + 8], "little")
            if v >= 0xFFFFFFFF00000001:
                raise ValueError("secret limbs must be canonical field elements")
        self._buf = np.frombuffer(bytearray(data), dtype=np.uint8).copy()
        self._scrubbed = False

    @classmethod
    def from_hex(cls, s: str) -> "Secret":
        return cls(bytes.fromhex(s.strip()))

    def expose_digest(self) -> bytes:
        """The raw 32 bytes. Handle with care; do not log."""
        self._check()
        return self._buf.tobytes()

    def expose_felts(self) -> np.ndarray:
        """The 4-felt (8 bytes/felt) encoding used in hash preimages."""
        self._check()
        return sz.bytes_to_digest(self._buf.tobytes())

    def scrub(self) -> None:
        """Volatile-overwrite the owned buffer."""
        if not self._scrubbed:
            self._buf[:] = 0
            self._scrubbed = True

    def _check(self):
        if self._scrubbed:
            raise ValueError("secret already scrubbed")

    def __eq__(self, other) -> bool:
        if not isinstance(other, Secret):
            return NotImplemented
        # constant-time: XOR-accumulate all bytes
        acc = int(np.bitwise_xor(self._buf, other._buf).sum())
        return acc == 0

    def __hash__(self):
        raise TypeError("secrets are not hashable")

    def __repr__(self):
        return "Secret([REDACTED])"

    def __del__(self):
        try:
            self.scrub()
        except Exception:
            pass


class SensitiveFelts:
    """A scrub-on-drop felt buffer (full capacity up front; no reallocation)."""

    __slots__ = ("_arr", "_scrubbed")

    def __init__(self, felts):
        self._arr = np.asarray(felts, dtype=np.uint64).copy()
        self._scrubbed = False

    def view(self) -> np.ndarray:
        if self._scrubbed:
            raise ValueError("buffer already scrubbed")
        return self._arr

    def scrub(self) -> None:
        if not self._scrubbed:
            self._arr[:] = 0
            self._scrubbed = True

    def __len__(self):
        return len(self._arr)

    def __repr__(self):
        return f"SensitiveFelts(len={len(self._arr)}, [REDACTED])"

    def __del__(self):
        try:
            self.scrub()
        except Exception:
            pass
