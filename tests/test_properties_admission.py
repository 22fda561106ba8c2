"""Property tests for the aggregation ADMISSION surface (VERDICT r3 #8).

Hypothesis twins of the reference's fail-fast batch-compatibility rules
(`aggregator/src/private_batch/prover/lib.rs:372-460`) and the pool's
oracle-hardened push ordering (`pool.rs:315-449`): random batch
compositions — real/dummy mixes, shared vs. divergent block/fee/asset,
duplicate nullifiers, shuffled slots — against `ensure_leaf_batch_compatible`
and `ProofPool.push`/eviction invariants.

Pure host code (no device, no proving): safe in the CPU pass.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qp_zk_circuits_tpu.wormhole import inputs as wi
from qp_zk_circuits_tpu.wormhole.pool import BatchKey, PoolError, PoolLimits, ProofPool
from qp_zk_circuits_tpu.wormhole.private_batch import (
    BatchCompatibilityError,
    ensure_leaf_batch_compatible,
)

DEFAULT = settings(max_examples=60, deadline=None,
                   suppress_health_check=[HealthCheck.too_slow])

P = 0xFFFFFFFF00000001


def digest(n: int) -> wi.BytesDigest:
    return wi.BytesDigest(int(n).to_bytes(32, "little"))


def leaf_pi(*, dummy: bool, block: int, bn: int, fee: int, asset: int, null: int):
    """Synthetic PublicCircuitInputs. Dummies follow the sentinel (zero block
    hash AND zero outputs, `circuit/src/circuit.rs:257-286`)."""
    if dummy:
        return wi.PublicCircuitInputs(
            asset_id=0, output_amount_1=0, output_amount_2=0, volume_fee_bps=0,
            nullifier=digest(null), exit_account_1=digest(0),
            exit_account_2=digest(0), block_hash=wi.BytesDigest.zero(),
            block_number=0,
        )
    return wi.PublicCircuitInputs(
        asset_id=asset, output_amount_1=10, output_amount_2=5,
        volume_fee_bps=fee, nullifier=digest(null),
        exit_account_1=digest(7), exit_account_2=digest(8),
        block_hash=digest(block), block_number=bn,
    )


@st.composite
def batches(draw):
    """A random real/dummy slot mix with controlled divergence axes."""
    n = draw(st.integers(1, 8))
    # one reference tuple; each real slot either copies it or diverges
    ref = (draw(st.integers(1, 3)), draw(st.integers(0, 2)),
           draw(st.integers(0, 3)), draw(st.integers(0, 2)))
    slots = []
    nulls = []
    for i in range(n):
        if draw(st.booleans()):
            slots.append(("dummy", 0, 0, 0, 0, draw(st.integers(0, 50))))
            continue
        block, bn, fee, asset = ref
        axis = draw(st.sampled_from(["same", "block", "bn", "fee", "asset"]))
        if axis == "block":
            block = block + draw(st.integers(0, 1))
        elif axis == "bn":
            bn = bn + draw(st.integers(0, 1))
        elif axis == "fee":
            fee = fee + draw(st.integers(0, 1))
        elif axis == "asset":
            asset = asset + draw(st.integers(0, 1))
        null = draw(st.integers(0, 5))  # small domain -> real collisions
        slots.append(("real", block, bn, fee, asset, null))
        nulls.append(null)
    order = draw(st.permutations(range(n)))
    return [slots[i] for i in order]


class TestEnsureLeafBatchCompatible:
    @DEFAULT
    @given(batch=batches())
    def test_accepts_iff_rules_hold(self, batch):
        """The oracle: accept iff >=1 real AND all real share
        (block, bn, fee, asset) AND real nullifiers pairwise distinct."""
        parsed = [
            leaf_pi(dummy=(kind == "dummy"), block=b, bn=bn, fee=f, asset=a, null=nl)
            for kind, b, bn, f, a, nl in batch
        ]
        real = [s for s in batch if s[0] == "real"]
        keys = {(b, bn, f, a) for _, b, bn, f, a, _ in real}
        nulls = [nl for *_, nl in real]
        ok = bool(real) and len(keys) == 1 and len(set(nulls)) == len(nulls)
        try:
            ensure_leaf_batch_compatible(parsed)
            accepted = True
        except BatchCompatibilityError:
            accepted = False
        assert accepted == ok

    @DEFAULT
    @given(batch=batches(), seed=st.integers(0, 2**31))
    def test_order_independent(self, batch, seed):
        """Admission must not depend on slot order (commit() shuffles
        AFTER admission; a position-dependent rule would leak)."""
        parsed = [
            leaf_pi(dummy=(k == "dummy"), block=b, bn=bn, fee=f, asset=a, null=nl)
            for k, b, bn, f, a, nl in batch
        ]
        rng = np.random.default_rng(seed)
        shuffled = list(parsed)
        rng.shuffle(shuffled)

        def verdict(ps):
            try:
                ensure_leaf_batch_compatible(ps)
                return True
            except BatchCompatibilityError:
                return False

        assert verdict(parsed) == verdict(shuffled)


# ---------------------------------------------------------------------------
# pool admission properties (mocked proofs, as in test_pool_service.py)


class FakeProof:
    def __init__(self, pis, valid=True):
        self.public_inputs = np.asarray(pis, dtype=np.uint64)
        self.valid = valid


def make_pb_pis(n_leaf=2, block=1, asset=0, fee=10, nulls=(1000, 1001), amount=50):
    pis = np.zeros(21 * n_leaf + 8, dtype=np.uint64)
    pis[0] = 2 * n_leaf
    pis[1] = asset
    pis[2] = fee
    pis[3:7] = [block, 0, 0, 0]
    pis[7] = 100
    cursor = 8
    for _ in range(2 * n_leaf):
        pis[cursor] = amount
        pis[cursor + 1 : cursor + 5] = [7, 7, 7, 7]
        cursor += 5
    for k in range(n_leaf):
        pis[cursor : cursor + 4] = [nulls[k], 1, 2, 3]
        cursor += 4
    return pis


@st.composite
def push_plans(draw):
    """A sequence of pushes with controlled collision axes."""
    ops = []
    for i in range(draw(st.integers(1, 12))):
        ops.append(
            dict(
                block=draw(st.integers(0, 2)),  # 0 -> dummy sentinel reject
                asset=draw(st.integers(0, 1)),
                fee=draw(st.sampled_from([10, 20])),
                # small nullifier domain -> cross-proof duplicates happen
                nulls=(draw(st.integers(0, 6)) + 100, i + 1000),
                valid=draw(st.booleans()),
            )
        )
    return ops


class TestPoolAdmissionProperties:
    @DEFAULT
    @given(plan=push_plans())
    def test_invariants_after_any_push_sequence(self, plan):
        """After ANY push sequence: (a) pooled nullifiers are unique,
        (b) every pooled proof verified successfully, (c) no dummy
        (block_hash==0) proof ever pooled, (d) the index matches the
        buckets exactly, (e) rejected pushes leave NO trace (atomicity —
        the membership-oracle hardening depends on it)."""
        verified = []

        def verifier(p):
            verified.append(p)
            if not p.valid:
                raise ValueError("invalid proof")

        pool = ProofPool(
            verifier, n_leaf=2, batch_size=8,
            limits=PoolLimits(max_proofs=64, max_buckets=8,
                              max_verifies_per_window=1000),
        )
        accepted = []
        for op in plan:
            proof = FakeProof(
                make_pb_pis(block=op["block"], asset=op["asset"], fee=op["fee"],
                            nulls=op["nulls"]),
                valid=op["valid"],
            )
            before_index = set(pool._nullifier_index)
            before_count = sum(len(v) for v in pool._buckets.values())
            try:
                pool.push(proof)
                accepted.append(proof)
            except (PoolError, ValueError):
                # (e) rejected push left no trace
                assert set(pool._nullifier_index) == before_index
                assert sum(len(v) for v in pool._buckets.values()) == before_count

        entries = [e for b in pool._buckets.values() for e in b]
        all_nulls = [nf for e in entries for nf in e.nullifiers]
        assert len(all_nulls) == len(set(all_nulls))  # (a)
        assert all(e.proof.valid for e in entries)  # (b)
        assert all(
            int.from_bytes(bytes(e.parsed.block_data.block_hash), "little") != 0
            for e in entries
        )  # (c)
        assert set(all_nulls) == pool._nullifier_index  # (d)
        # every accepted proof is still in custody (push is the only remover
        # in this plan)
        assert len(entries) == len(accepted)

    @DEFAULT
    @given(plan=push_plans(), max_age=st.floats(0, 1e-6))
    def test_eviction_keeps_index_consistent(self, plan, max_age):
        """evict_settled + evict_older_than always leave the nullifier index
        exactly matching the remaining buckets (liveness backstop,
        `pool.rs:462-525`)."""
        pool = ProofPool(
            lambda p: None if p.valid else (_ for _ in ()).throw(ValueError()),
            n_leaf=2, batch_size=8,
            limits=PoolLimits(max_proofs=64, max_buckets=8,
                              max_verifies_per_window=1000),
        )
        for op in plan:
            try:
                pool.push(FakeProof(
                    make_pb_pis(block=op["block"], asset=op["asset"],
                                fee=op["fee"], nulls=op["nulls"]),
                    valid=op["valid"],
                ))
            except (PoolError, ValueError):
                pass
        # settle half the pooled nullifiers
        pooled = sorted(pool._nullifier_index)
        pool.evict_settled(pooled[::2])
        entries = [e for b in pool._buckets.values() for e in b]
        assert set(nf for e in entries for nf in e.nullifiers) == pool._nullifier_index
        # expire everything
        pool.evict_older_than(max_age)
        entries = [e for b in pool._buckets.values() for e in b]
        assert set(nf for e in entries for nf in e.nullifiers) == pool._nullifier_index

    @DEFAULT
    @given(n_push=st.integers(1, 4), n_snap=st.integers(1, 4))
    def test_snapshot_non_consuming_property(self, n_push, n_snap):
        """Any number of snapshots never changes pool contents (crashed-worker
        custody, `pool.rs:17-27`)."""
        pool = ProofPool(
            lambda p: None, n_leaf=2, batch_size=4,
            limits=PoolLimits(max_proofs=64, max_buckets=8,
                              max_verifies_per_window=1000),
        )
        keys = set()
        for i in range(n_push):
            keys.add(pool.push(FakeProof(make_pb_pis(nulls=(100 + i, 1000 + i)))))
        before = {k: len(v) for k, v in pool._buckets.items()}
        for _ in range(n_snap):
            for k in keys:
                got = pool.snapshot_batch(k)
                assert 0 < len(got) <= 4
        assert {k: len(v) for k, v in pool._buckets.items()} == before
