"""Wormhole leaf circuit end-to-end: dummy + real fixtures, PI layout,
forged-witness rejection, serialization round-trips, artifact pinning."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.plonk.serialization import (
    VerifierCircuitData,
    proof_from_bytes,
    proof_to_bytes,
)
from qp_zk_circuits_tpu.plonk.verifier import VerificationError, verify as plonk_verify
from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier


@pytest.fixture(scope="module")
def leaf_setup():
    prover = WormholeProver()
    inputs = th.test_inputs_0()
    proof = prover.prove_inputs(inputs, seed=1)
    return prover, proof


class TestLeafEndToEnd:
    def test_dummy_roundtrip(self, leaf_setup):
        prover, proof = leaf_setup
        pis = WormholeVerifier(prover.data).verify(proof)
        assert pis.is_dummy
        assert pis.asset_id == 0

    def test_real_leaf_roundtrip(self, leaf_setup):
        prover, _ = leaf_setup
        i0, i1 = th.two_real_leaves_same_block()
        p0 = prover.prove_inputs(i0, seed=2)
        pis0 = WormholeVerifier(prover.data).verify(p0)
        assert not pis0.is_dummy
        assert pis0.output_amount_1 == th.DEFAULT_OUTPUT_AMOUNTS[0]
        assert pis0.block_number == th.DEFAULT_BLOCK_NUMBER
        assert pis0.volume_fee_bps == th.DEFAULT_VOLUME_FEE_BPS

    def test_forged_fee_witness_fails(self, leaf_setup):
        """Outputs exceeding input after fees must be unprovable."""
        import dataclasses

        prover, _ = leaf_setup
        i0, _ = th.two_real_leaves_same_block()
        bad_public = dataclasses.replace(i0.public, output_amount_1=10_000)
        bad = dataclasses.replace(i0, public=bad_public)
        from qp_zk_circuits_tpu.plonk.builder import WitnessError

        with pytest.raises((WitnessError, ValueError, AssertionError)):
            prover.prove_inputs(bad, seed=3)

    def test_tampered_pi_rejected(self, leaf_setup):
        import copy

        prover, proof = leaf_setup
        bad = copy.deepcopy(proof)
        bad.public_inputs = bad.public_inputs.copy()
        bad.public_inputs[0] = 7  # claim different asset
        with pytest.raises(VerificationError):
            WormholeVerifier(prover.data).verify(bad)

    def test_proof_serialization_roundtrip(self, leaf_setup):
        prover, proof = leaf_setup
        data = proof_to_bytes(proof)
        back = proof_from_bytes(data)
        assert proof_to_bytes(back) == data  # byte-exact determinism
        plonk_verify(prover.data, back)

    def test_verifier_data_roundtrip_and_verify(self, leaf_setup):
        prover, proof = leaf_setup
        vdata = VerifierCircuitData.from_circuit_data(prover.data)
        blob = vdata.to_bytes()
        loaded = VerifierCircuitData.from_bytes(blob)
        assert loaded.to_bytes() == blob
        # the lean verifier view verifies proofs standalone
        plonk_verify(loaded, proof)
        # a tampered cap inside the blob is rejected at load (digest binding)
        from qp_zk_circuits_tpu.plonk.serialization import SerializationError

        bad_blob = bytearray(blob)
        bad_blob[-40] ^= 1  # inside the cap/digest tail
        with pytest.raises(SerializationError):
            VerifierCircuitData.from_bytes(bytes(bad_blob))
        # object-level: swapping the digest diverges the transcript -> reject
        loaded2 = VerifierCircuitData.from_bytes(blob)
        loaded2.circuit_digest = loaded2.circuit_digest.copy()
        loaded2.circuit_digest[0] ^= np.uint64(1)
        with pytest.raises(VerificationError):
            plonk_verify(loaded2, proof)

    def test_split_artifact_pair_roundtrip(self, leaf_setup):
        """The (verifier.bin, common.bin) SPLIT views — the reference ships
        VerifierOnlyCircuitData and CommonCircuitData as distinct artifacts
        (`verifier/src/lib.rs:199-204`) — must round-trip, verify, and reject
        a mismatched pair via the digest binding."""
        from qp_zk_circuits_tpu.plonk.serialization import SerializationError

        prover, proof = leaf_setup
        vdata = VerifierCircuitData.from_circuit_data(prover.data)
        vb = vdata.to_verifier_only_bytes()
        cb = vdata.to_common_bytes()
        assert vb != cb  # genuinely distinct views
        loaded = VerifierCircuitData.from_artifact_bytes(vb, cb)
        assert loaded.to_verifier_only_bytes() == vb
        assert loaded.to_common_bytes() == cb
        plonk_verify(loaded, proof)
        # pair mismatch: a common view claiming different layout is rejected
        bad_cb = bytearray(cb)
        bad_cb[-1] ^= 1  # PI count tail
        with pytest.raises(SerializationError):
            VerifierCircuitData.from_artifact_bytes(vb, bytes(bad_cb))
        # malformed verifier-only view (tampered cap felt) is rejected
        bad_vb = bytearray(vb)
        bad_vb[-40] ^= 1
        with pytest.raises(SerializationError):
            VerifierCircuitData.from_artifact_bytes(bytes(bad_vb), cb)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
