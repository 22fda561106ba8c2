"""Proof pool + aggregator service tests (host-only, mocked proofs).

Ports the reference's operational suites: oracle-hardened admission order,
verification budget, non-consuming snapshots (crashed-worker custody),
settlement/expiry eviction, bucket stats (`pool.rs:315-449, 462-551,
809-828`)."""

import threading
import numpy as np
import pytest

from qp_zk_circuits_tpu.wormhole import inputs as wi
from qp_zk_circuits_tpu.wormhole.pool import BatchKey, PoolError, PoolLimits, ProofPool


class FakeProof:
    """Carries a private-batch PI vector; verification controlled by a flag."""

    def __init__(self, pis, valid=True):
        self.public_inputs = np.asarray(pis, dtype=np.uint64)
        self.valid = valid


def make_pb_pis(n_leaf=2, block=1, asset=0, fee=10, null_seed=0, amount=50):
    pis = np.zeros(21 * n_leaf + 8, dtype=np.uint64)
    pis[0] = 2 * n_leaf
    pis[1] = asset
    pis[2] = fee
    pis[3:7] = [block, 0, 0, 0]
    pis[7] = 100
    cursor = 8
    for s in range(2 * n_leaf):
        pis[cursor] = amount
        pis[cursor + 1 : cursor + 5] = [7, 7, 7, 7]
        cursor += 5
    for k in range(n_leaf):
        pis[cursor : cursor + 4] = [1000 + null_seed * 10 + k, 1, 2, 3]
        cursor += 4
    return pis


def verifier(proof):
    if not proof.valid:
        raise ValueError("invalid proof")


@pytest.fixture
def pool():
    return ProofPool(verifier, n_leaf=2, batch_size=4, limits=PoolLimits(max_proofs=8, max_buckets=2, max_verifies_per_window=100))


class TestPool:
    def test_push_and_bucket(self, pool):
        key = pool.push(FakeProof(make_pb_pis(null_seed=1)))
        assert key.asset_id == 0 and key.volume_fee_bps == 10
        pool.push(FakeProof(make_pb_pis(null_seed=2)))
        assert pool.num_proofs() == 2
        stats = pool.bucket_stats()[key]
        assert stats.num_proofs == 2 and stats.last_snapshot_age is None

    def test_invalid_proof_rejected_before_bucket_checks(self, pool):
        with pytest.raises(ValueError):
            pool.push(FakeProof(make_pb_pis(null_seed=3), valid=False))
        assert pool.num_proofs() == 0

    def test_dummy_rejected(self, pool):
        with pytest.raises(PoolError):
            pool.push(FakeProof(make_pb_pis(block=0, null_seed=4)))

    def test_duplicate_nullifier_rejected(self, pool):
        pool.push(FakeProof(make_pb_pis(null_seed=5)))
        with pytest.raises(PoolError):
            pool.push(FakeProof(make_pb_pis(null_seed=5)))

    def test_snapshot_non_consuming(self, pool):
        key = pool.push(FakeProof(make_pb_pis(null_seed=6)))
        batch = pool.snapshot_batch(key)
        assert len(batch) == 1
        # crash the "worker": pool unchanged, snapshot age recorded
        assert pool.num_proofs() == 1
        assert pool.bucket_stats()[key].last_snapshot_age is not None
        # second snapshot returns the same proofs (custody retained)
        assert len(pool.snapshot_batch(key)) == 1

    def test_evict_settled(self, pool):
        key = pool.push(FakeProof(make_pb_pis(null_seed=7)))
        nf = bytes(np.array([1070, 1, 2, 3], dtype="<u8").tobytes())
        removed = pool.evict_settled([nf])
        assert removed == 1
        assert pool.num_proofs() == 0
        # nullifier index cleared: the same proof can be re-pooled
        pool.push(FakeProof(make_pb_pis(null_seed=7)))

    def test_evict_older_than(self, pool):
        pool.push(FakeProof(make_pb_pis(null_seed=8)))
        assert pool.evict_older_than(1e6) == 0
        assert pool.evict_older_than(-1.0) == 1

    def test_verify_budget(self):
        p = ProofPool(
            verifier, n_leaf=2, batch_size=4,
            limits=PoolLimits(max_verifies_per_window=2, verify_window_secs=9999),
        )
        p.push(FakeProof(make_pb_pis(null_seed=10)))
        p.push(FakeProof(make_pb_pis(null_seed=11)))
        with pytest.raises(PoolError, match="budget"):
            p.push(FakeProof(make_pb_pis(null_seed=12)))

    def test_bucket_and_pool_caps(self):
        p = ProofPool(verifier, n_leaf=2, batch_size=1, limits=PoolLimits(max_proofs=8, max_buckets=1))
        p.push(FakeProof(make_pb_pis(null_seed=20, block=5)))
        with pytest.raises(PoolError, match="bucket is full"):
            p.push(FakeProof(make_pb_pis(null_seed=21, block=5)))
        with pytest.raises(PoolError, match="buckets"):
            p.push(FakeProof(make_pb_pis(null_seed=22, block=6)))

    def test_concurrent_settlement_custody(self, pool):
        """Plain-thread concurrency: snapshots + evictions race safely."""
        key = pool.push(FakeProof(make_pb_pis(null_seed=30)))

        def worker():
            for _ in range(50):
                pool.snapshot_batch(key)

        def evictor():
            for _ in range(50):
                pool.evict_older_than(1e6)

        ts = [threading.Thread(target=worker), threading.Thread(target=evictor)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert pool.num_proofs() == 1


class TestMemprofHelpers:
    def test_rebalance(self):
        from qp_zk_circuits_tpu.tools.memprof import rebalance_query_rounds

        assert rebalance_query_rounds(3, 16) == 28  # the canonical profile
        assert rebalance_query_rounds(4, 16) == 21
        assert rebalance_query_rounds(3, 16) * 3 + 16 >= 100

    def test_cli_definition(self):
        from qp_zk_circuits_tpu.tools.circuit_builder_cli import build_parser

        ap = build_parser()
        args = ap.parse_args(["--output", "/tmp/x", "--num-leaf-proofs", "4"])
        assert args.num_leaf_proofs == 4
        with pytest.raises(SystemExit):
            ap.parse_args([])  # --output required


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
