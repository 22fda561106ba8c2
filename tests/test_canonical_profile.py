"""Canonical-profile CI gate (VERDICT r3 #7): the production configuration
(135/60 wires, 28 query rounds x rate 3 + 16 PoW = 100 bits, ZK row
blinding) proven END TO END — leaf -> private batch N=2 -> verify.

The reduced-FRI suites cover logic; this covers the only profile that
ships. It is heavy (canonical graphs; warm runtime ~10-20 min on the TPU
with a warm .jax_cache, hours cold on CPU), so it is gated:

    QZKT_CANONICAL=1 python -m pytest tests/test_canonical_profile.py -q

run_tests.sh documents the gate. The reference's aggregator tests likewise
run real generated artifacts once per process (`aggregator_tests.rs:39-93`).
"""

import os

import numpy as np
import pytest

from qp_zk_circuits_tpu.plonk.serialization import VerifierCircuitData
from qp_zk_circuits_tpu.plonk.verifier import verify as plonk_verify
from qp_zk_circuits_tpu.wormhole import inputs as wi
from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.dummy_proof import generate_dummy_proof
from qp_zk_circuits_tpu.wormhole.private_batch import (
    PrivateBatchCircuit,
    PrivateBatchProver,
)
from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

pytestmark = pytest.mark.skipif(
    os.environ.get("QZKT_CANONICAL") != "1",
    reason="canonical-profile gate: set QZKT_CANONICAL=1 (heavy: canonical graphs)",
)


def test_canonical_n2_private_batch_end_to_end():
    # default constructors = canonical configs (security floor ENFORCED)
    leaf_prover = WormholeProver()
    assert leaf_prover.data.config.total_security_bits() >= wi.MIN_LEAF_SECURITY_BITS
    leaf_verifier = WormholeVerifier(leaf_prover.data)

    i0, i1 = th.two_real_leaves_same_block()
    p0 = leaf_prover.prove_inputs(i0, seed=10)
    p1 = leaf_prover.prove_inputs(i1, seed=11)
    leaf_verifier.verify(p0)
    leaf_verifier.verify(p1)

    leaf_common = VerifierCircuitData.from_circuit_data(leaf_prover.data)
    circuit = PrivateBatchCircuit(leaf_common, 2)  # canonical ZK 135/60
    assert circuit.data.config.zero_knowledge
    assert circuit.data.config.num_routed_wires == 60
    dummy = generate_dummy_proof(leaf_prover, seed=12)
    prover = PrivateBatchProver(circuit, leaf_verifier, dummy)
    agg = prover.aggregate([p0, p1], seed=0, rng=np.random.default_rng(0))
    plonk_verify(circuit.data, agg)

    pis = wi.PrivateBatchPublicInputs.from_felts(
        np.asarray(agg.public_inputs, dtype=np.uint64)
    )
    assert pis.asset_id == 0
    # value conservation: summed exits == summed leaf outputs
    total_in = sum(
        p.output_amount_1 + p.output_amount_2
        for p in (leaf_verifier.verify(p0), leaf_verifier.verify(p1))
    )
    total_out = sum(a.summed_output_amount for a in pis.account_data)
    assert total_in == total_out
