"""Artifact pipeline: generation, atomic staging, pinning, poisoning.

Counterparts of the reference suites:
  * staging fault injection — `circuit-builder/src/lib.rs:458-587`;
  * artifact poisoning / substitution — `aggregator_tests.rs:413-935`;
  * VK substitution via the fake leaf — `circuit_logic.rs:1869-1950`,
    `common/recursive.rs:144-240`;
  * keccak pin enforcement — `verifier/src/lib.rs:101-112`.

Proving tests run at the reduced-FRI toy profile (like the reference's
fake-backend tests); the canonical profile is exercised by the e2e/bench
markers.
"""

import shutil

import numpy as np
import pytest

from qp_zk_circuits_tpu.fri.config import FriConfig, FriReductionStrategy
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.plonk.serialization import SerializationError, VerifierCircuitData
from qp_zk_circuits_tpu.wormhole import artifacts as art
from qp_zk_circuits_tpu.wormhole import canonical_pins as pins
from qp_zk_circuits_tpu.wormhole import inputs as wi
from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.aggregator_service import PublicBatchAggregator
from qp_zk_circuits_tpu.wormhole.private_batch import (
    BatchCompatibilityError,
    PrivateBatchProver,
)
from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
from qp_zk_circuits_tpu.wormhole.public_batch import PublicBatchProver
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


# ---------------------------------------------------------------------------
# host-only: atomic staging fault injection


class TestStaging:
    def test_swap_in_failure_rolls_back(self, tmp_path):
        target = tmp_path / "bins"
        target.mkdir()
        (target / "old.bin").write_bytes(b"old")
        staging = art.create_staging_dir(target)
        (staging / "new.bin").write_bytes(b"new")

        calls = []

        def failing_rename(src, dst):
            calls.append((src, dst))
            if len(calls) == 2:  # the staging -> target swap-in
                raise OSError("injected swap-in failure")
            return __import__("os").rename(src, dst)

        with pytest.raises(art.ArtifactError, match="rolled back"):
            art.commit_staging_dir(staging, target, rename=failing_rename)
        # old directory restored
        assert (target / "old.bin").read_bytes() == b"old"

    def test_double_failure_preserves_both_copies(self, tmp_path):
        target = tmp_path / "bins"
        target.mkdir()
        (target / "old.bin").write_bytes(b"old")
        staging = art.create_staging_dir(target)
        (staging / "new.bin").write_bytes(b"new")

        calls = []

        def always_fail_after_move_aside(src, dst):
            calls.append((src, dst))
            if len(calls) == 1:
                return __import__("os").rename(src, dst)
            raise OSError("injected")

        with pytest.raises(art.ArtifactError, match="preserved"):
            art.commit_staging_dir(staging, target, rename=always_fail_after_move_aside)
        # both copies still on disk somewhere under tmp_path
        leftovers = sorted(p.name for p in tmp_path.glob("*/*.bin"))
        assert leftovers == ["new.bin", "old.bin"]

    def test_success_replaces_and_cleans_up(self, tmp_path):
        target = tmp_path / "bins"
        target.mkdir()
        (target / "old.bin").write_bytes(b"old")
        staging = art.create_staging_dir(target)
        (staging / "new.bin").write_bytes(b"new")
        art.commit_staging_dir(staging, target)
        assert (target / "new.bin").read_bytes() == b"new"
        assert not (target / "old.bin").exists()
        # no stray staging/move-aside dirs
        assert [p.name for p in tmp_path.iterdir()] == ["bins"]


class TestBinsConfig:
    def test_round_trip_and_legacy_keys(self, tmp_path):
        cfg = art.CircuitBinsConfig(num_leaf_proofs=8, num_private_batch_proofs=4)
        cfg.save(tmp_path / "config.json")
        assert art.CircuitBinsConfig.load(tmp_path / "config.json") == cfg
        (tmp_path / "legacy.json").write_text('{"num_proofs": 3, "num_agg_proofs": 5}')
        legacy = art.CircuitBinsConfig.load(tmp_path / "legacy.json")
        assert (legacy.num_leaf_proofs, legacy.num_private_batch_proofs) == (3, 5)

    def test_invalid_counts_rejected(self, tmp_path):
        (tmp_path / "bad.json").write_text('{"num_leaf_proofs": 0, "num_private_batch_proofs": 4}')
        with pytest.raises(wi.InputsError):
            art.CircuitBinsConfig.load(tmp_path / "bad.json")
        (tmp_path / "big.json").write_text(
            f'{{"num_leaf_proofs": {wi.MAX_PROOF_COUNT + 1}, "num_private_batch_proofs": 4}}'
        )
        with pytest.raises(wi.InputsError):
            art.CircuitBinsConfig.load(tmp_path / "big.json")


def test_canonical_pins_are_set():
    """The compiled-in keccak pins must be present and well-formed (the
    reference's constants are compile-time — `verifier/src/lib.rs:101-112`)."""
    for pin in (pins.CANONICAL_LEAF_VERIFIER_KECCAK256, pins.CANONICAL_LEAF_COMMON_KECCAK256):
        assert pin is not None and len(pin) == 64
        bytes.fromhex(pin)


@pytest.mark.skipif(
    "QZKT_REGEN_PINS" not in __import__("os").environ,
    reason="pin regeneration: set QZKT_REGEN_PINS=1 (builds the CANONICAL leaf)",
)
def test_regenerate_canonical_pins():
    """The analogue of the reference's #[ignore]d fixture-regeneration test:
    rebuild the canonical leaf from source and check (or print) the keccak
    pins. Run explicitly after any consensus-affecting change."""
    from qp_zk_circuits_tpu.hash.keccak import keccak256

    vdata = VerifierCircuitData.from_circuit_data(WormholeProver().data)
    got_v = keccak256(vdata.to_verifier_only_bytes()).hex()
    got_c = keccak256(vdata.to_common_bytes()).hex()
    assert got_v == pins.CANONICAL_LEAF_VERIFIER_KECCAK256, (
        f"canonical verifier pin changed — update canonical_pins.py to {got_v}"
    )
    assert got_c == pins.CANONICAL_LEAF_COMMON_KECCAK256, (
        f"canonical common pin changed — update canonical_pins.py to {got_c}"
    )


# ---------------------------------------------------------------------------
# full artifact set at the toy profile: generate once, then load/poison


@pytest.fixture(scope="module")
def full_bins(tmp_path_factory):
    out = tmp_path_factory.mktemp("artifacts") / "bins"
    art.generate_all_circuit_binaries(
        out,
        num_leaf_proofs=N_LEAF,
        num_private_batch_proofs=2,
        include_aggregation=True,
        seed=3,
        leaf_config=LEAF_CFG,
        private_batch_config=PB_CFG,
        public_batch_config=PUB_CFG,
        enforce_security_floor=False,
    )
    leaf_rebuild = VerifierCircuitData.from_circuit_data(WormholeProver(LEAF_CFG).data)
    return out, leaf_rebuild


class TestFullArtifactSet:
    def test_complete_set_published(self, full_bins):
        out, _ = full_bins
        names = sorted(p.name for p in out.iterdir())
        assert names == sorted(art.FULL_ARTIFACT_SET)

    def test_loaders_round_trip_and_prove(self, full_bins):
        out, leaf_rebuild = full_bins
        prover = PrivateBatchProver.new_from_binaries_dir(
            out, config=PB_CFG, leaf_rebuild=leaf_rebuild, enforce_security_floor=False
        )
        leaf_prover = WormholeProver(LEAF_CFG)
        i0, _ = th.two_real_leaves_same_block()
        p0 = leaf_prover.prove_inputs(i0, seed=40)
        agg = prover.aggregate([p0], seed=41, rng=np.random.default_rng(5))
        # the public layer, loaded from the same artifact set
        pb_rebuild = VerifierCircuitData.from_circuit_data(prover.circuit.data)
        service = PublicBatchAggregator.from_binaries_dir(
            out,
            aggregator_address=wi.BytesDigest(th.DEFAULT_EXIT_ACCOUNT),
            config=PUB_CFG,
            private_batch_rebuild=pb_rebuild,
            enforce_security_floor=False,
        )
        service.push_proof(agg)
        key = next(iter(service.bucket_stats()))
        pub = service.aggregate(key, seed=42)
        parsed = service.verify(pub)
        assert parsed.aggregator_address == wi.BytesDigest(th.DEFAULT_EXIT_ACCOUNT)

    def test_all_three_loader_entry_points_construct(self, full_bins):
        """Regression for r3's shipped-red loader bug (artifacts.py passed 3
        args to the 4-parameter `_load_pinned_agg_verifier_data`): every
        production from-binaries constructor must at least CONSTRUCT
        (reference `prover/lib.rs:213`, `utils.rs:126-158`)."""
        out, leaf_rebuild = full_bins
        prover = PrivateBatchProver.new_from_binaries_dir(
            out, config=PB_CFG, leaf_rebuild=leaf_rebuild, enforce_security_floor=False
        )
        pb_rebuild = VerifierCircuitData.from_circuit_data(prover.circuit.data)
        PublicBatchProver.new_from_binaries_dir(
            out, config=PUB_CFG, private_batch_rebuild=pb_rebuild,
            enforce_security_floor=False,
        )
        PublicBatchAggregator.from_binaries_dir(
            out,
            aggregator_address=wi.BytesDigest(th.DEFAULT_EXIT_ACCOUNT),
            config=PUB_CFG,
            private_batch_rebuild=pb_rebuild,
            enforce_security_floor=False,
        )

    def test_poisoned_artifacts_rejected(self, full_bins, tmp_path):
        """Flip one byte in each pinned artifact: every loader must refuse
        (reference `aggregator_tests.rs:413-935`)."""
        out, leaf_rebuild = full_bins
        for name in (
            art.LEAF_VERIFIER_BIN,
            art.PRIVATE_BATCH_VERIFIER_BIN,
            art.PUBLIC_BATCH_VERIFIER_BIN,
        ):
            poisoned = tmp_path / f"poisoned-{name}"
            shutil.copytree(out, poisoned)
            blob = bytearray((poisoned / name).read_bytes())
            blob[len(blob) // 2] ^= 0x01
            (poisoned / name).write_bytes(bytes(blob))
            with pytest.raises(art.ArtifactError, match="canonical"):
                if name == art.LEAF_VERIFIER_BIN:
                    art.load_canonical_leaf_verifier_data(poisoned, rebuild=leaf_rebuild)
                elif name == art.PRIVATE_BATCH_VERIFIER_BIN:
                    PrivateBatchProver.new_from_binaries_dir(
                        poisoned, config=PB_CFG, leaf_rebuild=leaf_rebuild,
                        enforce_security_floor=False,
                    )
                else:
                    pb_rebuild = VerifierCircuitData.from_bytes(
                        (out / art.PRIVATE_BATCH_VERIFIER_BIN).read_bytes(),
                        max_len=art.MAX_AGG_ARTIFACT_BYTES,
                    )
                    PublicBatchProver.new_from_binaries_dir(
                        poisoned, config=PUB_CFG, private_batch_rebuild=pb_rebuild,
                        enforce_security_floor=False,
                    )

    def test_poisoned_dummy_template_rejected(self, full_bins, tmp_path):
        """Replace the dummy leaf template with a REAL proof: template
        validation must refuse it (reference poisoned-dummy suite)."""
        out, leaf_rebuild = full_bins
        poisoned = tmp_path / "poisoned-dummy"
        shutil.copytree(out, poisoned)
        leaf_prover = WormholeProver(LEAF_CFG)
        i0, _ = th.two_real_leaves_same_block()
        real = leaf_prover.prove_inputs(i0, seed=50)
        from qp_zk_circuits_tpu.plonk.serialization import proof_to_bytes

        (poisoned / art.DUMMY_PROOF_BIN).write_bytes(proof_to_bytes(real))
        with pytest.raises(BatchCompatibilityError, match="dummy"):
            PrivateBatchProver.new_from_binaries_dir(
                poisoned, config=PB_CFG, leaf_rebuild=leaf_rebuild,
                enforce_security_floor=False,
            )

    def test_bins_dir_mutation_after_init_ignored(self, full_bins, tmp_path):
        """The service pins everything at construction; trashing the bins dir
        afterwards must not affect proving (reference `aggregator_tests.rs`:
        bins_dir mutation after init)."""
        out, leaf_rebuild = full_bins
        work = tmp_path / "bins-copy"
        shutil.copytree(out, work)
        prover = PrivateBatchProver.new_from_binaries_dir(
            work, config=PB_CFG, leaf_rebuild=leaf_rebuild, enforce_security_floor=False
        )
        for p in work.iterdir():
            p.write_bytes(b"garbage")
        leaf_prover = WormholeProver(LEAF_CFG)
        i0, _ = th.two_real_leaves_same_block()
        p0 = leaf_prover.prove_inputs(i0, seed=51)
        agg = prover.aggregate([p0], seed=52, rng=np.random.default_rng(9))
        from qp_zk_circuits_tpu.plonk.verifier import verify as plonk_verify

        plonk_verify(prover.circuit.data, agg)


# ---------------------------------------------------------------------------
# VK substitution: fake-leaf proofs must be rejected


class TestVkSubstitution:
    def test_fake_leaf_proof_rejected_at_admission(self, full_bins):
        from qp_zk_circuits_tpu.plonk.verifier import VerificationError
        from qp_zk_circuits_tpu.wormhole.fake_leaf import FakeLeafCircuit

        out, leaf_rebuild = full_bins
        prover = PrivateBatchProver.new_from_binaries_dir(
            out, config=PB_CFG, leaf_rebuild=leaf_rebuild, enforce_security_floor=False
        )
        fake = FakeLeafCircuit(LEAF_CFG)
        i0, _ = th.two_real_leaves_same_block()
        forged = fake.prove_pis(i0.public.to_felts(), seed=60)
        # sanity: the forged proof DOES verify under the fake circuit
        from qp_zk_circuits_tpu.plonk.verifier import verify as plonk_verify

        plonk_verify(fake.data, forged)
        # ... but the batch prover (pinned to the real leaf VK) refuses it
        with pytest.raises(VerificationError):
            prover.commit([forged])

    def test_fake_leaf_proof_rejected_by_recursion_witness(self, full_bins):
        """Even bypassing admission, a fake-leaf proof cannot be witnessed
        into the recursion targets of the real circuit (constant-VK baking —
        reference `recursive.rs:144-240`)."""
        out, leaf_rebuild = full_bins
        prover = PrivateBatchProver.new_from_binaries_dir(
            out, config=PB_CFG, leaf_rebuild=leaf_rebuild, enforce_security_floor=False
        )
        from qp_zk_circuits_tpu.wormhole.fake_leaf import FakeLeafCircuit

        fake = FakeLeafCircuit(LEAF_CFG)
        i0, _ = th.two_real_leaves_same_block()
        forged = fake.prove_pis(i0.public.to_felts(), seed=61)
        prover._slots = [forged] + [prover.dummy_template] * (N_LEAF - 1)
        prover._rng = np.random.default_rng(11)
        with pytest.raises(Exception):
            prover.prove(seed=62)
