"""Circuit-config structural validation policy + canonical Wormhole configs.

Port of reference `common/src/circuit.rs:378-571`: the single most audited
surface. Wormhole circuit constructors validate caller-supplied configs at
the API boundary so impossible values fail fast instead of deep inside the
engine mid-build, and resource-pathological values (exponential LDE/cap
sizes) are rejected before any allocation.
"""

from __future__ import annotations

from dataclasses import replace

from ..plonk.config import (
    CircuitConfig,
    standard_recursion_config,
    standard_recursion_zk_config,
)

# The Poseidon2 gate needs 130 wire columns (reference engine's Poseidon gate
# needs 135); keep the reference floor so configs stay interchangeable.
MIN_NUM_WIRES = 135
# Recursion gate floor (the 16-point coset-interpolation gate routes 37 wires).
MIN_NUM_ROUTED_WIRES = 37
# Poseidon constraints have degree 7.
MIN_MAX_QUOTIENT_DEGREE_FACTOR = 7
# lde_size = 2^(degree_bits + rate_bits) per committed polynomial.
MAX_RATE_BITS = 8
# Merkle caps are 2^cap_height digests per oracle.
MAX_CAP_HEIGHT = 8


class ConfigError(ValueError):
    pass


def _log2_ceil(x: int) -> int:
    return (x - 1).bit_length()


def validate_circuit_config(config: CircuitConfig) -> None:
    """Raise ConfigError on structurally impossible / pathological configs."""
    for name, value in [
        ("num_challenges", config.num_challenges),
        ("security_bits", config.security_bits),
        ("fri_config.num_query_rounds", config.fri_config.num_query_rounds),
    ]:
        if value <= 0:
            raise ConfigError(f"circuit config {name} must be greater than 0")
    if config.num_wires < MIN_NUM_WIRES:
        raise ConfigError(
            f"circuit config num_wires ({config.num_wires}) must be >= {MIN_NUM_WIRES} "
            "(Poseidon gate floor)"
        )
    if config.num_routed_wires < MIN_NUM_ROUTED_WIRES:
        raise ConfigError(
            f"circuit config num_routed_wires ({config.num_routed_wires}) must be >= "
            f"{MIN_NUM_ROUTED_WIRES} (recursion gate floor)"
        )
    if config.num_routed_wires > config.num_wires:
        raise ConfigError(
            f"circuit config num_routed_wires ({config.num_routed_wires}) must be <= "
            f"num_wires ({config.num_wires}); routed wires are a prefix of the wire columns"
        )
    if config.max_quotient_degree_factor < MIN_MAX_QUOTIENT_DEGREE_FACTOR:
        raise ConfigError(
            f"circuit config max_quotient_degree_factor ({config.max_quotient_degree_factor}) "
            f"must be >= {MIN_MAX_QUOTIENT_DEGREE_FACTOR} (Poseidon constraint degree)"
        )
    if config.fri_config.rate_bits > MAX_RATE_BITS:
        raise ConfigError(
            f"circuit config fri_config.rate_bits ({config.fri_config.rate_bits}) must be <= "
            f"{MAX_RATE_BITS} (LDE memory doubles per bit)"
        )
    if config.fri_config.cap_height > MAX_CAP_HEIGHT:
        raise ConfigError(
            f"circuit config fri_config.cap_height ({config.fri_config.cap_height}) must be <= "
            f"{MAX_CAP_HEIGHT} (caps scale as 2^cap_height)"
        )
    qdb = _log2_ceil(config.max_quotient_degree_factor)
    if config.fri_config.rate_bits < qdb:
        raise ConfigError(
            f"circuit config fri_config.rate_bits ({config.fri_config.rate_bits}) must be >= "
            f"ceil(log2(max_quotient_degree_factor = {config.max_quotient_degree_factor})) = {qdb}"
        )


def wormhole_leaf_circuit_config() -> CircuitConfig:
    """Non-ZK leaf profile (reference `common/src/circuit.rs:378-380`)."""
    return standard_recursion_config()


def wormhole_private_batch_circuit_config() -> CircuitConfig:
    """ZK (row blinding), 135 wires / 60 routed (reference `:396-410`)."""
    return replace(standard_recursion_zk_config(), num_wires=135, num_routed_wires=60)


def wormhole_public_batch_circuit_config() -> CircuitConfig:
    """Non-ZK public aggregation profile (reference `:412-414`)."""
    return standard_recursion_config()
