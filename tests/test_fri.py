"""FRI end-to-end: commit random polynomial batches, open, prove, verify,
and adversarial tamper probes (every mutation must be rejected).

One protocol run is shared module-wide (proving is compile-heavy on CPU)."""

import copy

import numpy as np
import pytest

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.fri import FriConfig
from qp_zk_circuits_tpu.fri import oracle as fo
from qp_zk_circuits_tpu.fri.prover import FriBatchInfo, FriInstance, fri_prove
from qp_zk_circuits_tpu.fri.verifier import FriVerificationError, fri_verify
from qp_zk_circuits_tpu.plonk.transcript import Challenger

DEGREE_BITS = 8
CFG = FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8, num_query_rounds=12)


def _drive(oa, ob, tamper_opening=False):
    ch = Challenger()
    ch.observe_cap(oa.cap)
    ch.observe_cap(ob.cap)
    z = ch.challenge_ext()
    zp = ch.challenge_ext()
    instance = FriInstance(
        batches=(
            FriBatchInfo(
                point=(int(z[0]), int(z[1])),
                polys=((0, 0), (0, 1), (0, 2), (1, 0), (1, 1)),
            ),
            FriBatchInfo(point=(int(zp[0]), int(zp[1])), polys=((1, 0),)),
        )
    )
    ya = oa.eval_at_ext(z)
    yb = ob.eval_at_ext(z)
    ybp = ob.eval_at_ext(zp)
    openings = [np.concatenate([ya, yb], axis=0), ybp[0:1]]
    if tamper_opening:
        openings[0] = openings[0].copy()
        openings[0][0, 0] = F.add(openings[0][0, 0], np.uint64(1))
    for o in openings:
        ch.observe_many(o)
    return ch, instance, openings


@pytest.fixture(scope="module")
def protocol():
    rng = np.random.default_rng(0xF121)
    polys_a = F.rand_felts((3, 1 << DEGREE_BITS), rng)
    polys_b = F.rand_felts((2, 1 << DEGREE_BITS), rng)
    oa = fo.commit(polys_a, CFG.rate_bits, CFG.cap_height)
    ob = fo.commit(polys_b, CFG.rate_bits, CFG.cap_height, blinding=True, salt_seed=42)
    ch, instance, openings = _drive(oa, ob)
    proof = fri_prove([oa, ob], instance, openings, ch, CFG, DEGREE_BITS)
    return oa, ob, instance, openings, proof


def _verify(oa, ob, instance, openings, proof):
    # re-drive the transcript with the CLAIMED openings (which may be tampered)
    ch = Challenger()
    ch.observe_cap(oa.cap)
    ch.observe_cap(ob.cap)
    ch.challenge_ext()
    ch.challenge_ext()
    for o in openings:
        ch.observe_many(o)
    fri_verify(
        [oa.cap, ob.cap], [3, 2], instance, openings, proof, ch, CFG, DEGREE_BITS
    )


class TestFri:
    def test_roundtrip(self, protocol):
        oa, ob, instance, openings, proof = protocol
        _verify(oa, ob, instance, openings, proof)  # must not raise
        assert len(proof.commit_caps) == 1  # schedule(8) = [3]
        assert proof.final_poly.shape[0] <= 32

    def test_tampered_opening_fails(self, protocol):
        oa, ob, instance, openings, proof = protocol
        bad = [o.copy() for o in openings]
        bad[0][0, 0] = F.add(bad[0][0, 0], np.uint64(1))
        with pytest.raises(FriVerificationError):
            _verify(oa, ob, instance, bad, proof)

    def test_dishonest_opening_fails(self, protocol):
        """Prover claims a wrong opening from the start: Q is not low-degree,
        so the prover-side degree assert trips (or verification fails)."""
        oa, ob, _, _, _ = protocol
        with pytest.raises((AssertionError, FriVerificationError)):
            ch, instance, openings = _drive(oa, ob, tamper_opening=True)
            proof = fri_prove([oa, ob], instance, openings, ch, CFG, DEGREE_BITS)
            _verify(oa, ob, instance, openings, proof)

    def test_tampered_proof_parts_fail(self, protocol):
        oa, ob, instance, openings, proof = protocol

        p1 = copy.deepcopy(proof)
        p1.pow_witness = np.uint64(int(p1.pow_witness) + 1)
        with pytest.raises(FriVerificationError):
            _verify(oa, ob, instance, openings, p1)

        p2 = copy.deepcopy(proof)
        p2.final_poly = p2.final_poly.copy()
        p2.final_poly[0, 0] = F.add(p2.final_poly[0, 0], np.uint64(1))
        with pytest.raises(FriVerificationError):
            _verify(oa, ob, instance, openings, p2)

        p3 = copy.deepcopy(proof)
        p3.query_rounds[0].initial_rows[0] = p3.query_rounds[0].initial_rows[0].copy()
        p3.query_rounds[0].initial_rows[0][0] ^= np.uint64(1)
        with pytest.raises(FriVerificationError):
            _verify(oa, ob, instance, openings, p3)

        p4 = copy.deepcopy(proof)
        step = p4.query_rounds[0].steps[0]
        step.leaf_values = step.leaf_values.copy()
        step.leaf_values[0, 0] ^= np.uint64(1)
        with pytest.raises(FriVerificationError):
            _verify(oa, ob, instance, openings, p4)

    def test_salted_leaves_hide_rows(self, protocol):
        _, ob, _, _, _ = protocol
        row = ob.open_rows([0])[0]
        assert row.shape[0] == 2 + 4


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
