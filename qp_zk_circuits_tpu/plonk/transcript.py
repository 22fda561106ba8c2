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
        arr = np.asarray(felts, dtype=np.uint64).ravel()
        if arr.size == 0:
            return
        nat = ps._native()
        if nat is not None and arr.size >= 16:
            # batched duplex absorption in C; replicate observe()'s output-buf
            # rule: it is non-empty only when the LAST felt completed a block
            self.output_buf.clear()
            before = len(self.input_buf)
            self.state, self.input_buf = nat.absorb_many(
                self.state, self.input_buf, arr
            )
            if not self.input_buf and (before + arr.size) % ps.RATE == 0:
                self.output_buf = list(self.state[: ps.RATE])
            return
        for f in arr:
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


import functools


@functools.cache
def _grind_jit(batch: int, slot: int, pow_bits: int):
    """Device grind kernel: permute `batch` candidate duplex states (witness
    w = start + i in wire `slot`), return (found, first index)."""
    import jax
    import jax.numpy as jnp

    from ..field import goldilocks as gl

    hi_thresh = 1 << (32 - pow_bits) if pow_bits <= 32 else 0

    def run(base_state, start_lo, start_hi):
        idx = jnp.arange(batch, dtype=jnp.uint32)
        lo = jnp.broadcast_to(base_state.lo, (batch, ps.WIDTH))
        hi = jnp.broadcast_to(base_state.hi, (batch, ps.WIDTH))
        # w = start + i (no lane overflow for batch < 2^32)
        w_lo = start_lo + idx
        carry = (w_lo < start_lo).astype(jnp.uint32)
        w_hi = start_hi + carry
        lo = lo.at[:, slot].set(w_lo)
        hi = hi.at[:, slot].set(w_hi)
        out = ps.permute_j(gl.GF(lo, hi))
        o_lo, o_hi = out.lo[:, 0], out.hi[:, 0]
        if pow_bits <= 32:
            mask = o_hi < jnp.uint32(hi_thresh)
        else:
            mask = (o_hi == 0) & (o_lo < jnp.uint32(1 << (64 - pow_bits)))
        # one fused output -> one host transfer
        return jnp.stack(
            [jnp.any(mask).astype(jnp.uint32), jnp.argmax(mask).astype(jnp.uint32)]
        )

    return jax.jit(run)


def grind_pow(challenger: Challenger, pow_bits: int, batch: int = 1 << 17) -> np.uint64:
    """Find a witness w such that observing w yields a challenge with
    >= pow_bits leading zero bits (the reference's 16-bit FRI grind,
    `wormhole/circuit/src/profile.rs:138-144`). The 2^pow_bits-average search
    runs as ONE batched Poseidon2 sweep on device."""
    from ..field import goldilocks as gl

    if not 0 <= pow_bits <= 32:
        raise ValueError(f"pow_bits out of range: {pow_bits}")
    if pow_bits == 0:
        # every witness passes; the device kernel's uint32 threshold would
        # overflow, so answer directly (and deterministically) with 0
        return np.uint64(0)
    base = challenger.fork()
    threshold = 1 << (64 - pow_bits)
    k = len(base.input_buf)
    state = base.state.copy()
    state[:k] = np.asarray(base.input_buf, dtype=np.uint64)[:k] if k else state[:k]
    kernel = _grind_jit(batch, k, pow_bits)
    jstate = gl.from_u64(state)
    start = 0
    while True:
        found, idx = np.asarray(
            kernel(jstate, np.uint32(start & 0xFFFFFFFF), np.uint32(start >> 32))
        )
        if bool(found):
            w = np.uint64(start + int(idx))
            probe = base.fork()
            probe.observe(w)
            if int(probe.challenge()) < threshold:
                return w
            # the device and host Poseidon2 are pinned bit-identical, so a
            # mismatch here is a real bug — fail loudly, never mask it
            raise AssertionError("PoW grind verification mismatch")
        start += batch


def check_pow(challenger: Challenger, witness, pow_bits: int) -> bool:
    challenger.observe(witness)
    return int(challenger.challenge()) < (1 << (64 - pow_bits))
