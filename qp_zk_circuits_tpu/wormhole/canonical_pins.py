"""Keccak256 pins of the canonical leaf verifier artifacts.

The reference hard-codes keccak256 digests of the canonical verifier.bin /
common.bin as compile-time constants and refuses to load any artifact whose
bytes do not match (`wormhole/verifier/src/lib.rs:101-112`). These constants
play the same role: they are regenerated ONLY by the pinned-regeneration test
(`tests/test_artifacts.py::test_regenerate_canonical_pins`, gated behind
QZKT_REGEN_PINS=1, the analogue of the reference's `#[ignore]`d fixture
regeneration test) and reviewed like any other consensus-critical change.

Serialization here is deterministic (little-endian u64 arrays, no maps —
`plonk/serialization.py`), so the digests are stable across hosts.
"""

# keccak256(verifier.bin) for the canonical leaf profile
# (wormhole_leaf_circuit_config: 135 wires, 80 routed, 28 queries, 16 PoW).
CANONICAL_LEAF_VERIFIER_KECCAK256: str | None = (
    "e2c3e925dee7d5c8871557bbd1edbf63871e007faf065af807329e8fa75e86f7"
)

# keccak256(common.bin); in this engine the lean verifier view serves both
# roles so the two pins coincide (documented deviation — PARITY.md).
CANONICAL_LEAF_COMMON_KECCAK256: str | None = (
    "e2c3e925dee7d5c8871557bbd1edbf63871e007faf065af807329e8fa75e86f7"
)
