"""Full aggregation tree end-to-end (reduced-FRI test profile):
leaf proofs -> private batch (ZK, recursive) -> public batch.

Mirrors the reference's aggregator integration suite
(`wormhole/tests/src/aggregator/aggregator_tests.rs`): real generated
artifacts, the two-real-leaves-same-block fixture, grouping/dedup value
conservation, sorted decorrelated nullifiers, partial batches with dummy
padding, admission rejections."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.fri.config import FriConfig, FriReductionStrategy
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.plonk.serialization import VerifierCircuitData
from qp_zk_circuits_tpu.plonk.verifier import verify as plonk_verify
from qp_zk_circuits_tpu.wormhole import inputs as wi
from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.dummy_proof import generate_dummy_proof
from qp_zk_circuits_tpu.wormhole.private_batch import (
    BatchCompatibilityError,
    PrivateBatchCircuit,
    PrivateBatchProver,
    generate_dummy_private_batch_proof,
)
from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
from qp_zk_circuits_tpu.wormhole.public_batch import (
    PublicBatchCircuit,
    PublicBatchProver,
)
from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

TEST_FRI = FriConfig(
    rate_bits=3,
    cap_height=1,
    proof_of_work_bits=6,
    num_query_rounds=10,
    reduction_strategy=FriReductionStrategy(4, 5),
)
LEAF_CFG = CircuitConfig(num_wires=135, num_routed_wires=80, num_challenges=2, fri_config=TEST_FRI)
PB_CFG = CircuitConfig(
    num_wires=135, num_routed_wires=80, num_challenges=2, zero_knowledge=True, fri_config=TEST_FRI
)
PUB_CFG = CircuitConfig(num_wires=135, num_routed_wires=80, num_challenges=2, fri_config=TEST_FRI)
N_LEAF = 2


@pytest.fixture(scope="module")
def stack():
    """Build the full artifact stack once (the expensive part)."""
    leaf_prover = WormholeProver(LEAF_CFG)
    leaf_verifier = WormholeVerifier(leaf_prover.data, enforce_security_floor=False)
    i0, i1 = th.two_real_leaves_same_block()
    p0 = leaf_prover.prove_inputs(i0, seed=10)
    p1 = leaf_prover.prove_inputs(i1, seed=11)
    dummy_leaf = generate_dummy_proof(leaf_prover, seed=12)
    leaf_common = VerifierCircuitData.from_circuit_data(leaf_prover.data)
    pb_circuit = PrivateBatchCircuit(
        leaf_common, N_LEAF, config=PB_CFG, enforce_security_floor=False
    )
    pb_prover = PrivateBatchProver(pb_circuit, leaf_verifier, dummy_leaf)
    return leaf_prover, leaf_verifier, p0, p1, dummy_leaf, pb_circuit, pb_prover


class TestPrivateBatch:
    def test_two_real_leaves_aggregate(self, stack):
        _, _, p0, p1, _, pb_circuit, pb_prover = stack
        agg = pb_prover.aggregate([p0, p1], seed=20, rng=np.random.default_rng(7))
        plonk_verify(pb_circuit.data, agg)
        parsed = wi.PrivateBatchPublicInputs.from_felts(agg.public_inputs)
        assert parsed.num_exit_slots == 2 * N_LEAF
        assert parsed.block_data.block_number == th.DEFAULT_BLOCK_NUMBER
        # grouping: both leaves pay the same exit account -> ONE summed slot,
        # duplicates and zero-account slots zeroed (value conservation)
        sums = sorted(a.summed_output_amount for a in parsed.account_data)
        assert sums == [0, 0, 0, sum(th.DEFAULT_OUTPUT_AMOUNTS)]
        paying = [a for a in parsed.account_data if a.summed_output_amount > 0]
        assert paying[0].exit_account == wi.BytesDigest(th.DEFAULT_EXIT_ACCOUNT)
        # nullifier region: sorted (limb-0-major canonical order) and contains
        # exactly the two real nullifiers
        i0, i1 = th.two_real_leaves_same_block()
        reals = {bytes(i0.public.nullifier), bytes(i1.public.nullifier)}
        got = {bytes(nf) for nf in parsed.nullifiers}
        assert got == reals

        def key(nf):
            limbs = np.frombuffer(nf, dtype="<u8")
            return tuple(int(v) for v in limbs)

        assert sorted(parsed.nullifiers, key=key) == list(parsed.nullifiers)
        TestPrivateBatch._agg = agg  # reuse downstream

    def test_partial_batch_pads_with_dummies(self, stack):
        _, _, p0, _, _, pb_circuit, pb_prover = stack
        agg = pb_prover.aggregate([p0], seed=21, rng=np.random.default_rng(8))
        plonk_verify(pb_circuit.data, agg)
        parsed = wi.PrivateBatchPublicInputs.from_felts(agg.public_inputs)
        sums = sorted(a.summed_output_amount for a in parsed.account_data)
        assert sums == [0, 0, 0, th.DEFAULT_OUTPUT_AMOUNTS[0]]
        # one real + one random (dummy) nullifier; the dummy is canonical
        i0, _ = th.two_real_leaves_same_block()
        assert bytes(i0.public.nullifier) in {bytes(n) for n in parsed.nullifiers}

    def test_admission_rejections(self, stack):
        _, _, p0, p1, dummy_leaf, _, pb_prover = stack
        with pytest.raises(BatchCompatibilityError, match="duplicate nullifier"):
            pb_prover.commit([p0, p0])
        with pytest.raises(BatchCompatibilityError, match="at least one real"):
            pb_prover.commit([dummy_leaf, dummy_leaf])
        with pytest.raises(BatchCompatibilityError, match="batch size"):
            pb_prover.commit([p0, p1, p0])


class TestPublicBatch:
    def test_public_batch_end_to_end(self, stack):
        _, _, p0, p1, dummy_leaf, pb_circuit, pb_prover = stack
        pb_common = VerifierCircuitData.from_circuit_data(pb_circuit.data)
        pub_circuit = PublicBatchCircuit(pb_common, m=2, n_leaf=N_LEAF, config=PUB_CFG)

        agg = getattr(TestPrivateBatch, "_agg", None)
        if agg is None:
            agg = pb_prover.aggregate([p0, p1], seed=20, rng=np.random.default_rng(7))
        dummy_pb = generate_dummy_private_batch_proof(
            pb_circuit, dummy_leaf, rng=np.random.default_rng(9), seed=23
        )

        def inner_verify(proof):
            plonk_verify(pb_circuit.data, proof)

        pub_prover = PublicBatchProver(pub_circuit, inner_verify, dummy_pb)
        addr = wi.BytesDigest(bytes([9] * 8) + bytes(24))
        pub = pub_prover.commit([agg], addr).prove(seed=24)
        plonk_verify(pub_circuit.data, pub)
        parsed = wi.PublicBatchPublicInputs.from_felts(pub.public_inputs, 2, N_LEAF)
        assert parsed.aggregator_address == addr
        assert parsed.total_exit_slots == 2 * 2 * N_LEAF
        # first segment forwards the private batch's slots in order; the
        # dummy-padded second segment is zeroed
        sums = [a.summed_output_amount for a in parsed.account_data]
        assert sum(sums) == sum(th.DEFAULT_OUTPUT_AMOUNTS)
        assert all(s == 0 for s in sums[2 * N_LEAF :])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
