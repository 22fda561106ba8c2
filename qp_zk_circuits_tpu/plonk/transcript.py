"""Fiat-Shamir transcript: a Poseidon2 duplex-sponge challenger (host side).

Mirrors the role of plonky2's `Challenger` (the reference's transcripts must
reproduce Fiat-Shamir exactly for cross-verification — SURVEY §7 "Hard
parts"): observe proof elements as felts, derive challenges by duplexing.
The challenger is pure host logic (numpy, tiny state) — challenges gate the
device pipeline stages, so they live where the control flow lives.

Determinism contract: the prover and verifier drive a Challenger through the
identical observe/challenge schedule; any reordering breaks verification
(tested in tests/test_fri.py with a tampered-transcript probe).
"""

from __future__ import annotations

import numpy as np

from ..field import gf_np as F
from ..hash import poseidon2 as ps


class Challenger:
    def __init__(self):
        self.state = np.zeros(ps.WIDTH, dtype=np.uint64)
        self.input_buf: list[np.uint64] = []
        self.output_buf: list[np.uint64] = []

    # -- observing ---------------------------------------------------------
    def observe(self, felt) -> None:
        self.output_buf.clear()
        self.input_buf.append(np.uint64(felt))
        if len(self.input_buf) == ps.RATE:
            self._duplex()

    def observe_many(self, felts) -> None:
        for f in np.asarray(felts, dtype=np.uint64).ravel():
            self.observe(f)

    def observe_ext(self, ext_val) -> None:
        self.observe_many(np.asarray(ext_val, dtype=np.uint64).ravel())

    def observe_cap(self, cap: np.ndarray) -> None:
        self.observe_many(np.asarray(cap, dtype=np.uint64).ravel())

    # -- challenges --------------------------------------------------------
    def _duplex(self) -> None:
        st = self.state.copy()
        if self.input_buf:
            st[: len(self.input_buf)] = self.input_buf
        self.state = ps.permute_np(st)
        self.input_buf.clear()
        self.output_buf = list(self.state[: ps.RATE])

    def challenge(self) -> np.uint64:
        if self.input_buf or not self.output_buf:
            self._duplex()
        return self.output_buf.pop(0)

    def challenge_many(self, n: int) -> np.ndarray:
        return np.array([self.challenge() for _ in range(n)], dtype=np.uint64)

    def challenge_ext(self) -> np.ndarray:
        c0 = self.challenge()
        c1 = self.challenge()
        return np.array([c0, c1], dtype=np.uint64)

    def challenge_index(self, domain_size: int) -> int:
        """Sample a query index in [0, domain_size) (power-of-two domain)."""
        return int(self.challenge()) % domain_size

    def fork(self) -> "Challenger":
        c = Challenger()
        c.state = self.state.copy()
        c.input_buf = list(self.input_buf)
        c.output_buf = list(self.output_buf)
        return c


def grind_pow(challenger: Challenger, pow_bits: int, batch: int = 4096) -> np.uint64:
    """Find a witness w such that observing w yields a challenge with
    >= pow_bits leading zero bits (the reference's 16-bit FRI grind,
    `wormhole/circuit/src/profile.rs:138-144`). Vectorised host search:
    duplex candidate states in batches."""
    # Snapshot the duplex state the witness will be absorbed into.
    base = challenger.fork()
    # Normalise: absorbing w as one more input then duplexing.
    threshold = np.uint64(1) << np.uint64(64 - pow_bits)
    start = 0
    while True:
        ws = np.arange(start, start + batch, dtype=np.uint64)
        states = np.tile(base.state, (batch, 1))
        k = len(base.input_buf)
        if k:
            states[:, :k] = np.asarray(base.input_buf, dtype=np.uint64)
        states[:, k] = ws  # witness goes into the next input slot
        out = ps.permute_np(states)[:, 0]
        hits = np.nonzero(out < threshold)[0]
        for h in hits:
            w = np.uint64(ws[h])
            probe = base.fork()
            probe.observe(w)
            if int(probe.challenge()) < int(threshold):
                return w
        start += batch


def check_pow(challenger: Challenger, witness, pow_bits: int) -> bool:
    challenger.observe(witness)
    return int(challenger.challenge()) < (1 << (64 - pow_bits))
