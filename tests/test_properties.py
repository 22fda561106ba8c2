"""Property-based differential tests (hypothesis).

The reference's spec-differential and encoding-safety suites are proptest
(`wormhole/tests/tests/spec_differential.rs:1-24`,
`encoding_safety.rs:40-69`): every clause is checked over RANDOM inputs, not
fixed vectors. These are the property twins of `test_spec_differential.py` —
same clauses, hypothesis-driven domains (random secrets, transfer counts,
amounts, byte strings, tree shapes).

Pure host code (numpy + the native C hasher): no device, safe in the CPU
pass.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.hash import poseidon2 as ps
from qp_zk_circuits_tpu.utils import serialization as sz
from qp_zk_circuits_tpu.utils import zk_merkle as zm
from qp_zk_circuits_tpu.wormhole import circuit_inputs as ci
from qp_zk_circuits_tpu.wormhole.sensitive import Secret

P = 0xFFFFFFFF00000001

# modest example counts: each example runs real Poseidon2 hashing
DEFAULT = settings(max_examples=30, deadline=None,
                   suppress_health_check=[HealthCheck.too_slow])

canonical_limb = st.integers(min_value=0, max_value=P - 1)
u64s = st.integers(min_value=0, max_value=(1 << 64) - 1)


@st.composite
def secrets(draw):
    limbs = [draw(canonical_limb) for _ in range(4)]
    return b"".join(v.to_bytes(8, "little") for v in limbs)


@st.composite
def digests(draw):
    limbs = [draw(canonical_limb) for _ in range(4)]
    return sz.digest_to_bytes(np.array(limbs, dtype=np.uint64))


def h(preimage):
    return ps.hash_no_pad(np.asarray(preimage, dtype=np.uint64))


def hh(preimage):
    return ps.hash_no_pad(h(preimage))


class TestHashDerivations:
    """Clause twins of spec_differential.rs C1/C2/C3 over random domains."""

    @DEFAULT
    @given(secret=secrets())
    def test_wa_double_hash(self, secret):
        expected = hh(
            np.concatenate([sz.string_to_felts("wormhole"), sz.bytes_to_digest(secret)])
        )
        assert np.array_equal(ci.unspendable_account_from_secret(Secret(secret)), expected)

    @DEFAULT
    @given(secret=secrets(), tc=u64s)
    def test_nullifier_double_hash(self, secret, tc):
        expected = hh(
            np.concatenate(
                [
                    sz.string_to_felts("~nullif~"),
                    sz.bytes_to_digest(secret),
                    sz.u64_to_felts(tc),
                ]
            )
        )
        assert np.array_equal(ci.nullifier_from_preimage(Secret(secret), tc), expected)

    @DEFAULT
    @given(to=st.lists(canonical_limb, min_size=4, max_size=4), tc=u64s,
           asset=u64s, amount=st.integers(0, (1 << 32) - 1))
    def test_leaf_hash_preimage_order(self, to, tc, asset, amount):
        to = np.array(to, dtype=np.uint64)
        expected = h(
            np.concatenate(
                [to, sz.u64_to_felts(tc), np.array([asset, amount], dtype=np.uint64)]
            )
        )
        assert np.array_equal(ci.compute_zk_leaf_hash(to, tc, asset, amount), expected)


class TestEncodingSafety:
    """Twins of encoding_safety.rs: injectivity, round-trips, canonicality."""

    @DEFAULT
    @given(data=st.binary(max_size=300))
    def test_bytes_felts_roundtrip(self, data):
        felts = sz.bytes_to_felts(data)
        assert sz.felts_to_bytes(felts) == data

    @DEFAULT
    @given(a=st.binary(max_size=64), b=st.binary(max_size=64))
    def test_bytes_felts_injective(self, a, b):
        """The 4-byte+terminator encoding is injective across LENGTHS too
        (the terminator binds the byte count within the final felt)."""
        fa, fb = sz.bytes_to_felts(a), sz.bytes_to_felts(b)
        if a != b:
            assert fa.shape != fb.shape or not np.array_equal(fa, fb)
        else:
            assert np.array_equal(fa, fb)

    @DEFAULT
    @given(limbs=st.lists(canonical_limb, min_size=1, max_size=8))
    def test_compact_roundtrip_canonical(self, limbs):
        data = b"".join(v.to_bytes(8, "little") for v in limbs)
        felts = sz.bytes_to_felts_compact(data)
        assert [int(v) for v in felts] == limbs

    @DEFAULT
    @given(limb=st.integers(min_value=P, max_value=(1 << 64) - 1))
    def test_compact_rejects_noncanonical(self, limb):
        """{v, v+p} byte aliases make non-canonical limbs unsafe — the compact
        decoder must reject them (the witnessed {0,p} collision is the fixed
        anchor in test_spec_differential.py)."""
        with pytest.raises(Exception):
            sz.bytes_to_felts_compact(limb.to_bytes(8, "little"))

    @DEFAULT
    @given(v=st.integers(min_value=0, max_value=(1 << 64) - P - 1))
    def test_alias_collision_class(self, v):
        """For every canonical v with v + p < 2^64, the u64s v and v + p map
        to the SAME felt under lazy reduction (`from_noncanonical_u64`) — the
        whole alias class behind the witnessed {0, p} collision, which is why
        the strict compact decoder must reject limbs >= p."""
        lazy = F.from_noncanonical_u64(np.uint64(v + P))
        assert int(lazy) == v
        with pytest.raises(Exception):
            sz.bytes_to_felts_compact((v + P).to_bytes(8, "little"))

    @DEFAULT
    @given(n=u64s)
    def test_u64_roundtrip(self, n):
        assert sz.felts_to_u64(sz.u64_to_felts(n)) == n

    @DEFAULT
    @given(n=st.integers(min_value=0, max_value=(1 << 128) - 1))
    def test_u128_roundtrip(self, n):
        assert sz.felts_to_u128(sz.u128_to_felts(n)) == n

    @DEFAULT
    @given(q=st.integers(min_value=0, max_value=(1 << 32) - 1))
    def test_quantization_roundtrip_on_multiples(self, q):
        amount = q * sz.AMOUNT_QUANTIZATION_FACTOR
        felt = sz.u128_to_quantized_felt(amount)
        assert sz.quantized_felt_to_u128(felt) == amount

    @DEFAULT
    @given(n=st.integers(
        min_value=0,
        max_value=((1 << 32) - 1) * sz.AMOUNT_QUANTIZATION_FACTOR
        + sz.AMOUNT_QUANTIZATION_FACTOR - 1,
    ))
    def test_quantization_floors(self, n):
        felt = sz.u128_to_quantized_felt(n)
        assert sz.quantized_felt_to_u128(felt) == (
            n // sz.AMOUNT_QUANTIZATION_FACTOR
        ) * sz.AMOUNT_QUANTIZATION_FACTOR

    @DEFAULT
    @given(n=st.integers(
        min_value=(1 << 32) * sz.AMOUNT_QUANTIZATION_FACTOR,
        max_value=(1 << 128) - 1,
    ))
    def test_quantization_rejects_oversized(self, n):
        """Amounts whose quantized value exceeds the 32-bit limb are
        attacker-controlled overflow attempts — always rejected."""
        with pytest.raises(Exception):
            sz.u128_to_quantized_felt(n)


class TestMerkleProperties:
    """Twins of the stepUp/insert and tree-walk clauses over random shapes."""

    @DEFAULT
    @given(current=digests(), sibs=st.lists(digests(), min_size=3, max_size=3))
    def test_insert_at_position_matches_step_up(self, current, sibs):
        sibs = sorted(sibs)
        all_sorted = sorted([current] + sibs)
        pos = all_sorted.index(current)
        via_insert = zm.hash_node_presorted(zm.insert_at_position(current, sibs, pos))
        via_sort = zm.hash_node(sibs + [current])
        assert via_insert == via_sort

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(leaves=st.lists(digests(), min_size=1, max_size=16, unique=True),
           data=st.data())
    def test_tree_prove_verify(self, leaves, data):
        import dataclasses

        tree = zm.ZkMerkleTree(leaves)
        idx = data.draw(st.integers(0, len(leaves) - 1))
        proof = tree.prove(idx)
        assert proof.verify_with_positions()
        # tampering with the claimed leaf must fail
        other = bytes(32) if leaves[idx] != bytes(32) else sz.digest_to_bytes(
            np.array([1, 2, 3, 4], dtype=np.uint64)
        )
        if other not in leaves and proof.siblings:
            forged = dataclasses.replace(proof, leaf_hash=other)
            assert not forged.verify_with_positions()


class TestAggregationModels:
    """Native models of the private-batch wrapper constraints over random
    batches (the in-circuit versions are pinned in test_aggregation.py)."""

    @DEFAULT
    @given(pairs=st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 1000)), min_size=1, max_size=12
    ))
    def test_exit_grouping_value_conservation(self, pairs):
        accounts = [bytes([a]) * 32 for a, _ in pairs]
        amounts = [v for _, v in pairs]
        seen = set()
        total_out = 0
        for i, acct in enumerate(accounts):
            if acct in seen:
                continue
            seen.add(acct)
            total_out += sum(v for a2, v in zip(accounts, amounts) if a2 == acct)
        assert total_out == sum(amounts)

    @DEFAULT
    @given(blocks=st.lists(
        st.tuples(u64s, u64s, u64s, u64s) | st.just((0, 0, 0, 0)),
        min_size=1, max_size=8,
    ))
    def test_prefix_scan_block_reference(self, blocks):
        """reference = first non-dummy block hash; all-dummy -> 0 (the
        position-independence that makes the shuffle privacy-preserving)."""
        expect = next((b for b in blocks if any(b)), (0, 0, 0, 0))
        # prefix-scan model: found_j = OR(nonzero_0..j); ref = sum_j
        # block_j * (found_j - found_{j-1})
        found_prev = 0
        ref = (0, 0, 0, 0)
        for b in blocks:
            found = found_prev or int(any(b))
            if found and not found_prev:
                ref = b
            found_prev = found
        assert ref == expect

    @DEFAULT
    @given(digs=st.lists(st.tuples(canonical_limb, canonical_limb,
                                   canonical_limb, canonical_limb),
                         min_size=2, max_size=8))
    def test_nullifier_sort_key(self, digs):
        """Sort key = limb 0 most significant (the circuit's sort_digests4
        comparator order)."""
        key = lambda d: (d[0], d[1], d[2], d[3])  # noqa: E731
        s = sorted(digs, key=key)
        for a, b in zip(s, s[1:]):
            assert key(a) <= key(b)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
