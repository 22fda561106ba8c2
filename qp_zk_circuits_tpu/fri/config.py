"""FRI configuration, mirroring the reference's knob set.

The reference's canonical configs use rate_bits=3, cap_height=4, pow 16,
ConstantArityBits(4, 5) reduction and 28 query rounds for 100-bit security
(28*3 + 16 = 100; reference `common/src/circuit.rs:497-571`,
`wormhole/circuit/src/profile.rs:138-176`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FriReductionStrategy:
    """ConstantArityBits(arity_bits, final_poly_bits)."""

    arity_bits: int = 4
    final_poly_bits: int = 5

    def schedule(self, degree_bits: int) -> list[int]:
        """Per-round arity bits folding degree 2^degree_bits down to the final poly."""
        out = []
        d = degree_bits
        while d > self.final_poly_bits:
            a = min(self.arity_bits, d - self.final_poly_bits)
            out.append(a)
            d -= a
        return out


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3
    cap_height: int = 4
    proof_of_work_bits: int = 16
    num_query_rounds: int = 28
    reduction_strategy: FriReductionStrategy = field(default_factory=FriReductionStrategy)

    def security_bits(self) -> int:
        return self.num_query_rounds * self.rate_bits + self.proof_of_work_bits


SALT_SIZE = 4  # salt felts appended to blinded oracle leaves (zero-knowledge)
