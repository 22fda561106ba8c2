"""Recursive verification: an outer circuit verifies an inner proof.

The core capability for the aggregation layers (reference
`aggregator/src/common/recursive.rs`): inner VK baked as constants, inner
public inputs exposed as outer targets. Includes the tamper case: an invalid
inner proof must be unprovable."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.fri.config import FriConfig, FriReductionStrategy
from qp_zk_circuits_tpu.plonk.builder import (
    CircuitBuilder,
    PartialWitness,
    WitnessError,
)
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.plonk.prover import prove
from qp_zk_circuits_tpu.plonk.serialization import VerifierCircuitData
from qp_zk_circuits_tpu.plonk.verifier import verify
from qp_zk_circuits_tpu.recursion.verifier_gadget import (
    add_virtual_proof_with_pis,
    fill_proof_targets,
    verify_proof_circuit,
)

TEST_FRI = FriConfig(
    rate_bits=3,
    cap_height=1,
    proof_of_work_bits=6,
    num_query_rounds=10,
    reduction_strategy=FriReductionStrategy(4, 5),
)
INNER = CircuitConfig(num_wires=135, num_routed_wires=80, num_challenges=2, fri_config=TEST_FRI)
OUTER = CircuitConfig(num_wires=135, num_routed_wires=80, num_challenges=2, fri_config=TEST_FRI)


@pytest.fixture(scope="module")
def recursive_setup():
    # inner: z = x * y with z public
    bi = CircuitBuilder(INNER)
    x = bi.add_virtual_target()
    y = bi.add_virtual_target()
    z = bi.mul(x, y)
    bi.register_public_input(z)
    inner_data = bi.build()
    pw = PartialWitness()
    pw.set_target(x, 6)
    pw.set_target(y, 7)
    inner_proof = prove(inner_data, pw, seed=1)
    verify(inner_data, inner_proof)
    common = VerifierCircuitData.from_circuit_data(inner_data)

    # outer: verify the inner proof, re-expose its PI
    bo = CircuitBuilder(OUTER)
    pt = add_virtual_proof_with_pis(bo, common)
    verify_proof_circuit(bo, pt, common)
    bo.register_public_inputs(pt.public_inputs)
    outer_data = bo.build()
    return inner_data, inner_proof, common, outer_data, pt


class TestRecursion:
    def test_outer_proves_and_verifies(self, recursive_setup):
        inner_data, inner_proof, common, outer_data, pt = recursive_setup
        pw = PartialWitness()
        fill_proof_targets(pw, pt, inner_proof)
        outer_proof = prove(outer_data, pw, seed=2)
        verify(outer_data, outer_proof)
        assert list(outer_proof.public_inputs) == [42]

    def test_tampered_inner_proof_unprovable(self, recursive_setup):
        import copy

        inner_data, inner_proof, common, outer_data, pt = recursive_setup
        bad = copy.deepcopy(inner_proof)
        bad.public_inputs = bad.public_inputs.copy()
        bad.public_inputs[0] = 43  # claim 6*7 == 43
        pw = PartialWitness()
        fill_proof_targets(pw, pt, bad)
        with pytest.raises((WitnessError, ValueError, AssertionError)):
            prove(outer_data, pw, seed=3)

    def test_tampered_opening_unprovable(self, recursive_setup):
        import copy

        inner_data, inner_proof, common, outer_data, pt = recursive_setup
        bad = copy.deepcopy(inner_proof)
        bad.openings.wires = bad.openings.wires.copy()
        bad.openings.wires[0, 0] = F.add(bad.openings.wires[0, 0], np.uint64(1))
        pw = PartialWitness()
        fill_proof_targets(pw, pt, bad)
        with pytest.raises((WitnessError, ValueError, AssertionError)):
            prove(outer_data, pw, seed=4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
