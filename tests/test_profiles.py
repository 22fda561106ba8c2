"""Profile / scaling regression tests (shape-only, host-side).

Counterparts of the reference's `profile` cargo-feature tests:
- FRI-config security tradeoffs: `wormhole/circuit/src/profile.rs:127-189`
- aggregation scaling:           `wormhole/aggregator/src/profile.rs:187-226`

Full tables: `python -m qp_zk_circuits_tpu.tools.profile_circuits
{circuit,security,scaling}` (host-only; safe while the TPU is busy).
"""

from qp_zk_circuits_tpu.tools.profile_circuits import (
    aggregation_scaling,
    fake_leaf_verifier_data,
    security_tradeoffs,
    wormhole_circuit_profile,
)
from qp_zk_circuits_tpu.wormhole.private_batch import LEAF_PI_LEN


def test_leaf_profile_shapes():
    """Leaf circuit shape pins (reference profile.rs:80-119 prints these;
    we assert them so silent growth fails loudly)."""
    out = wormhole_circuit_profile()
    assert out["zk"]["num_public_inputs"] == LEAF_PI_LEN == 21
    assert out["no_zk"]["num_public_inputs"] == LEAF_PI_LEN
    # current budgets: ZK row blinding adds rows -> one extra degree bit
    assert out["no_zk"]["degree_bits"] == 8
    assert out["zk"]["degree_bits"] == 9
    assert out["zk"]["num_wires"] == 135 and out["zk"]["num_routed_wires"] == 60


def test_security_tradeoffs_leaf_degree_flat():
    """The reference's headline finding: cheaper FRI configs do NOT shrink
    the leaf circuit (degree stays flat); they only shrink proofs. Run the
    grid ends + one PoW-bumped config."""
    grid = [
        ("Standard ZK (100-bit)", 28, 16, 100),
        ("76-bit", 20, 16, 76),
        ("80-bit (20q + 20pow)", 20, 20, 80),
    ]
    rows = security_tradeoffs(grid)
    assert len({r["degree_bits"] for r in rows}) == 1
    for r in rows:
        assert r["security_bits"] == r["num_query_rounds"] * 3 + r["proof_of_work_bits"]


def test_aggregation_scaling_shape():
    """Private-batch shape vs leaf count: PI layout is 21N+8 and each leaf
    doubling costs exactly one degree bit at current budgets
    (reference aggregator/src/profile.rs:187-226). Degrees are ONE BIT
    BELOW the reference's 15/16 (their N=2 is 2^15): the ReducingGate packs
    the per-proof alpha-reductions ~30x denser than unrolled arithmetic
    rows, so the N=2 gadget fits 2^14 and N=8 fits 2^16."""
    rows = aggregation_scaling((2, 4))
    assert [r["num_public_inputs"] for r in rows] == [21 * 2 + 8, 21 * 4 + 8]
    assert rows[0]["degree_bits"] == 14
    assert rows[1]["degree_bits"] == 15
    assert rows[1]["rows_used"] < 2.2 * rows[0]["rows_used"]


def test_fake_leaf_verifier_data_is_shape_faithful():
    """The fake leaf data (dummy distinct cap felts) must agree with a real
    leaf build on every SHAPE field consumed by the recursion gadget."""
    from qp_zk_circuits_tpu.utils.config_policy import wormhole_leaf_circuit_config
    from qp_zk_circuits_tpu.wormhole.leaf_circuit import WormholeCircuit

    fake = fake_leaf_verifier_data()
    real = WormholeCircuit(wormhole_leaf_circuit_config()).build(shape_only=True)
    assert fake.degree_bits == real.degree_bits
    assert fake.num_selectors == real.num_selectors
    assert fake.num_const_cols == real.const_cols.shape[0]
    assert [g.key() for g in fake.gate_types] == [g.key() for g in real.gate_types]
    assert fake.num_public_inputs == len(real.public_input_targets)
    # cap felts must be pairwise distinct or constant-dedup would shrink the
    # baked-VK constant rows vs a real (hash-valued) cap
    flat = [int(x) for x in fake.constants_cap.ravel()]
    assert len(set(flat)) == len(flat)
