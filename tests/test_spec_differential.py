"""Property-based differential tests against the formal spec's relations.

Port of reference `wormhole/tests/tests/spec_differential.rs` +
`encoding_safety.rs`: native implementations pinned clause-by-clause to the
Lean spec's objects (WormholeSpec.*) — double-hash WA/nullifier, leaf/node
hash preimage orders, insert-at-position == stepUp, exit grouping value
conservation, prefix-scan block reference, dummy-nullifier double hash,
nullifier sort order, header preimage, and the witnessed {0, p} encoding
collision that makes canonicality load-bearing."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.field import gf_np as F
from qp_zk_circuits_tpu.hash import poseidon2 as ps
from qp_zk_circuits_tpu.utils import serialization as sz
from qp_zk_circuits_tpu.utils import zk_merkle as zm
from qp_zk_circuits_tpu.wormhole import circuit_inputs as ci
from qp_zk_circuits_tpu.wormhole.sensitive import Secret

P = 0xFFFFFFFF00000001


def h(preimage):
    return ps.hash_no_pad(np.asarray(preimage, dtype=np.uint64))


def hh(preimage):
    """The spec's double hash: hh p = H((H p).toList)."""
    return ps.hash_no_pad(h(preimage))


def _rand_digest_bytes(rng):
    return sz.digest_to_bytes(F.rand_felts(4, rng))


class TestSpecDifferential:
    def test_wa_matches_double_hash(self, rng):
        """C1: unspendable account = hh("wormhole"(3) || secret(4))."""
        secret_bytes = _rand_digest_bytes(rng)
        secret = Secret(secret_bytes)
        expected = hh(
            np.concatenate([sz.string_to_felts("wormhole"), sz.bytes_to_digest(secret_bytes)])
        )
        got = ci.unspendable_account_from_secret(secret)
        assert np.array_equal(got, expected)

    def test_nullifier_matches_double_hash(self, rng):
        """C2: nullifier = hh("~nullif~"(3) || secret(4) || tc(2))."""
        secret_bytes = _rand_digest_bytes(rng)
        tc = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        expected = hh(
            np.concatenate(
                [
                    sz.string_to_felts("~nullif~"),
                    sz.bytes_to_digest(secret_bytes),
                    sz.u64_to_felts(tc),
                ]
            )
        )
        got = ci.nullifier_from_preimage(Secret(secret_bytes), tc)
        assert np.array_equal(got, expected)
        # determinism (same preimage -> same nullifier)
        again = ci.nullifier_from_preimage(Secret(secret_bytes), tc)
        assert np.array_equal(got, again)

    def test_leaf_hash_preimage_order(self, rng):
        """C3: leaf hash preimage is to(4) || tc(2) || asset || amount."""
        to = F.rand_felts(4, rng)
        tc = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        asset, amount = 3, 777
        expected = h(
            np.concatenate([to, sz.u64_to_felts(tc), np.array([asset, amount], dtype=np.uint64)])
        )
        got = ci.compute_zk_leaf_hash(to, tc, asset, amount)
        assert np.array_equal(got, expected)

    def test_node_hash_matches_spec(self, rng):
        """nodeHash == H over the concatenated 16 child felts (pins the
        compact byte hash to the felt hash)."""
        children = [_rand_digest_bytes(rng) for _ in range(4)]
        actual = zm.hash_node_presorted(children)
        preimage = np.concatenate([sz.bytes_to_digest(c) for c in children])
        assert actual == sz.digest_to_bytes(h(preimage))

    def test_insert_at_position_matches_step_up(self, rng):
        """stepUp: inserting current at its hint among sorted siblings and
        hashing equals sorting all four and hashing."""
        current = _rand_digest_bytes(rng)
        sibs = sorted(_rand_digest_bytes(rng) for _ in range(3))
        all_sorted = sorted([current] + sibs)
        pos = all_sorted.index(current)
        via_insert = zm.hash_node_presorted(zm.insert_at_position(current, sibs, pos))
        via_sort = zm.hash_node(sibs + [current])
        assert via_insert == via_sort

    def test_exit_grouping_value_conservation(self, rng):
        """The grouping/dedup map conserves total value (native model of the
        circuit gadget)."""
        accounts = [bytes([rng.integers(1, 5)] * 32) for _ in range(6)]
        amounts = [int(rng.integers(0, 1000)) for _ in range(6)]
        # native model: first-occurrence-wins full-group sums
        out = []
        for i, acct in enumerate(accounts):
            if acct in [a for a, _ in out]:
                out.append((b"\x00" * 32, 0))
            else:
                out.append((acct, sum(a2 for acct2, a2 in zip(accounts, amounts) if acct2 == acct)))
        assert sum(s for _, s in out) == sum(amounts)

    def test_prefix_scan_block_reference(self, rng):
        """reference block = first non-dummy slot's block hash; all-dummy -> 0."""
        def ref(blocks):
            for bh in blocks:
                if any(bh):
                    return bh
            return (0, 0, 0, 0)

        assert ref([(0, 0, 0, 0), (5, 6, 7, 8), (1, 1, 1, 1)]) == (5, 6, 7, 8)
        assert ref([(0, 0, 0, 0)] * 3) == (0, 0, 0, 0)

    def test_dummy_nullifier_double_hash(self, rng):
        from qp_zk_circuits_tpu.wormhole.dummy_proof import (
            generate_random_nullifier_preimage,
        )

        pre = generate_random_nullifier_preimage(rng)
        felts = sz.bytes_to_digest(pre)
        assert np.all(F.is_canonical(np.frombuffer(pre, dtype="<u8")))
        # the circuit computes hh(preimage)
        assert hh(felts).shape == (4,)

    def test_nullifier_sort_order(self, rng):
        """The circuit's sort key: limb 0 most significant, canonical u64s."""
        digests = [tuple(int(v) for v in F.rand_felts(4, rng)) for _ in range(8)]
        sorted_ref = sorted(digests)
        assert sorted_ref == sorted(digests, key=lambda d: (d[0], d[1], d[2], d[3]))

    def test_header_preimage_order(self, rng):
        """header preimage = parent(4) || bn(1) || state(4) || extr(4) ||
        zk_root(4) || digest(28); block_hash = H(preimage)."""
        hi = ci.HeaderInputs.new(
            _rand_digest_bytes(rng),
            123,
            _rand_digest_bytes(rng),
            _rand_digest_bytes(rng),
            _rand_digest_bytes(rng),
            bytes(range(110)),
        )
        pre = hi.preimage()
        assert pre.shape == (45,)
        assert np.array_equal(pre[4:5], [123])
        assert hi.block_hash() == sz.digest_to_bytes(h(pre))


class TestEncodingSafety:
    def test_zero_p_collision_witness(self):
        """The witnessed {0, p} collision: byte-distinct, felt-identical —
        why canonicality checks are load-bearing."""
        zero_bytes = (0).to_bytes(8, "little")
        p_bytes = (P).to_bytes(8, "little")
        assert zero_bytes != p_bytes
        a = F.from_noncanonical_u64(np.frombuffer(zero_bytes, dtype="<u8"))
        b = F.from_noncanonical_u64(np.frombuffer(p_bytes, dtype="<u8"))
        assert np.array_equal(a, b)  # same field element!
        # and the digest validator rejects the alias
        from qp_zk_circuits_tpu.wormhole import inputs as wi

        with pytest.raises(wi.InputsError):
            wi.BytesDigest(p_bytes + bytes(24))

    def test_injective_encoding_roundtrips(self, rng):
        for n in [0, 1, 3, 4, 7, 110]:
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert sz.felts_to_bytes(sz.bytes_to_felts(data)) == data

    def test_felt_injectivity_across_lengths(self):
        """4B+terminator encoding: no two distinct inputs share an encoding."""
        seen = {}
        for n in range(0, 6):
            for val in [0, 1, 255]:
                data = bytes([val] * n)
                enc = tuple(int(v) for v in sz.bytes_to_felts(data))
                assert enc not in seen or seen[enc] == data
                seen[enc] = data


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
