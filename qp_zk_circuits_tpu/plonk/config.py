"""Circuit configuration, mirroring the reference's `CircuitConfig` knob set.

Field census from reference `common/src/circuit.rs:497-571` and
`wormhole/circuit/src/profile.rs:142-176`: num_wires, num_routed_wires,
num_challenges, security_bits, max_quotient_degree_factor, zero_knowledge,
fri_config{rate_bits, cap_height, proof_of_work_bits, reduction_strategy,
num_query_rounds}. The three canonical configs correspond to
`wormhole_leaf_circuit_config` / `wormhole_private_batch_circuit_config` /
`wormhole_public_batch_circuit_config` (`common/src/circuit.rs:378-414`).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..fri.config import FriConfig, FriReductionStrategy


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 135
    num_routed_wires: int = 80
    num_challenges: int = 2
    security_bits: int = 100
    max_quotient_degree_factor: int = 8
    zero_knowledge: bool = False
    fri_config: FriConfig = field(default_factory=FriConfig)

    @property
    def rate_bits(self) -> int:
        return self.fri_config.rate_bits

    def total_security_bits(self) -> int:
        return self.fri_config.security_bits()


def standard_recursion_config() -> CircuitConfig:
    """Non-ZK, 135/80 wires — the leaf + public-batch profile
    (reference `common/src/circuit.rs:378-391, 412-414`)."""
    return CircuitConfig()


def standard_recursion_zk_config() -> CircuitConfig:
    """ZK via row blinding, 135 wires / 60 routed — the private-batch profile
    (reference `common/src/circuit.rs:396-410`: RowBlinding, num_wires 135,
    num_routed_wires 60, lower memory than PolyFri)."""
    return replace(
        standard_recursion_config(),
        zero_knowledge=True,
        num_routed_wires=60,
    )
