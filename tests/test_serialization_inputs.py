"""Codec + inputs-layer tests: round-trips, injectivity witnesses, layout
parsers, config-policy floors (ports of the reference's encoding-safety and
config-validation suites — `wormhole/tests/tests/encoding_safety.rs`,
`common/src/circuit.rs:593-675`). Pure host, no JAX."""

import numpy as np
import pytest

from qp_zk_circuits_tpu.hash.keccak import keccak256
from qp_zk_circuits_tpu.utils import config_policy as cp
from qp_zk_circuits_tpu.utils import serialization as sz
from qp_zk_circuits_tpu.wormhole import inputs as wi

P = 0xFFFFFFFF00000001


class TestByteFeltCodecs:
    def test_bytes_roundtrip(self):
        for data in [b"", b"\x00", b"\x01\x02\x03", b"\xff" * 32, b"hello world", b"\x5a" * (1 << 20)]:
            felts = sz.bytes_to_felts(data)
            assert sz.felts_to_bytes(felts) == data

    def test_terminator_injectivity(self):
        # x and x || 0x00 must encode differently
        a = sz.bytes_to_felts(b"\x01\x02\x03")
        b = sz.bytes_to_felts(b"\x01\x02\x03\x00")
        assert not np.array_equal(a, b)

    def test_oversized_rejected(self):
        with pytest.raises(sz.SerializationError):
            sz.bytes_to_felts(b"\x00" * ((1 << 20) + 1))

    def test_compact_rejects_unaligned(self):
        for n in [1, 7, 9, 127, 129]:
            with pytest.raises(sz.SerializationError):
                sz.hash_bytes_compact(b"\x5a" * n)

    def test_compact_rejects_noncanonical_alias(self):
        canonical = (1).to_bytes(8, "little") + b"\x00" * 8
        alias = (1 + P).to_bytes(8, "little") + b"\x00" * 8
        sz.hash_bytes_compact(canonical)  # ok
        with pytest.raises(sz.SerializationError):
            sz.hash_bytes_compact(alias)

    def test_compact_trailing_zero_chunk_changes_hash(self):
        x = b"\x5a" * 16
        assert sz.hash_bytes_compact(x) != sz.hash_bytes_compact(x + b"\x00" * 8)

    def test_digest_roundtrip(self):
        d = bytes(range(31)) + b"\x00"
        felts = sz.bytes_to_digest(d)
        assert sz.digest_to_bytes(felts) == d

    def test_u64_u128_roundtrip(self):
        for v in [0, 1, 0xFFFFFFFF, 0x1234567890ABCDEF, (1 << 64) - 1]:
            assert sz.felts_to_u64(sz.u64_to_felts(v)) == v
        for v in [0, 1, (1 << 128) - 1, 0x123456789ABCDEF0123456789ABCDEF]:
            assert sz.felts_to_u128(sz.u128_to_felts(v)) == v

    def test_quantization(self):
        aqf = sz.AMOUNT_QUANTIZATION_FACTOR
        assert sz.quantized_felt_to_u128(sz.u128_to_quantized_felt(1234 * aqf)) == 1234 * aqf
        max_ok = 0xFFFFFFFF * aqf
        sz.u128_to_quantized_felt(max_ok)
        with pytest.raises(sz.SerializationError):
            sz.u128_to_quantized_felt(max_ok + aqf)


class TestInputsLayer:
    def _sample_pis(self):
        rng = np.random.default_rng(9)
        digest = wi.BytesDigest.from_felts(
            np.array([1, 2, 3, 4], dtype=np.uint64)
        )
        return wi.PublicCircuitInputs(
            asset_id=0,
            output_amount_1=99,
            output_amount_2=0,
            volume_fee_bps=10,
            nullifier=digest,
            exit_account_1=digest,
            exit_account_2=digest,
            block_hash=digest,
            block_number=7,
        )

    def test_leaf_pi_roundtrip(self):
        pis = self._sample_pis()
        felts = pis.to_felts()
        assert felts.shape == (21,)
        back = wi.PublicCircuitInputs.from_felts(felts)
        assert back == pis

    def test_digest_canonicality(self):
        bad = (P).to_bytes(8, "little") + b"\x00" * 24
        with pytest.raises(wi.InputsError):
            wi.BytesDigest(bad)
        wi.BytesDigest.new_unchecked(bad)  # unchecked path allows it

    def test_dummy_sentinel(self):
        pis = self._sample_pis()
        assert not pis.is_dummy
        import dataclasses

        dummy = dataclasses.replace(
            pis, block_hash=wi.BytesDigest.zero(), output_amount_1=0, output_amount_2=0
        )
        assert dummy.is_dummy

    def test_proof_count_policy(self):
        wi.validate_proof_count(1, "n")
        wi.validate_proof_count(64, "n")
        with pytest.raises(wi.InputsError):
            wi.validate_proof_count(0, "n")
        with pytest.raises(wi.InputsError):
            wi.validate_proof_count(65, "n")

    def test_private_batch_pi_roundtrip(self):
        n = 3
        pis = np.zeros(wi.PrivateBatchPublicInputs.pi_len(n), dtype=np.uint64)
        pis[0] = 2 * n
        pis[1] = 0  # asset
        pis[2] = 10  # fee
        pis[3:7] = [1, 2, 3, 4]  # block hash
        pis[7] = 42
        cursor = 8
        for i in range(2 * n):
            pis[cursor] = 100 + i
            pis[cursor + 1 : cursor + 5] = [5, 6, 7, 8]
            cursor += 5
        for i in range(n):
            pis[cursor : cursor + 4] = [9, 10, 11, 12]
            cursor += 4
        parsed = wi.PrivateBatchPublicInputs.from_felts(pis)
        assert parsed.num_exit_slots == 6
        assert parsed.block_data.block_number == 42
        assert len(parsed.account_data) == 6
        assert len(parsed.nullifiers) == 3
        # structural 2N validation
        bad = pis.copy()
        bad[0] = 5
        with pytest.raises(wi.InputsError):
            wi.PrivateBatchPublicInputs.from_felts(bad)

    def test_public_batch_layout(self):
        assert wi.public_batch_pi.pi_len(2, 4) == 12 + 2 * 8 * 5 + 2 * 4 * 4


class TestConfigPolicy:
    def test_canonical_configs_validate(self):
        for cfg in [
            cp.wormhole_leaf_circuit_config(),
            cp.wormhole_private_batch_circuit_config(),
            cp.wormhole_public_batch_circuit_config(),
        ]:
            cp.validate_circuit_config(cfg)
        zk = cp.wormhole_private_batch_circuit_config()
        assert zk.zero_knowledge and zk.num_routed_wires == 60 and zk.num_wires == 135

    def test_floors_and_ceilings(self):
        import dataclasses

        base = cp.wormhole_leaf_circuit_config()
        from qp_zk_circuits_tpu.fri.config import FriConfig

        bad_cases = [
            dataclasses.replace(base, num_wires=134),
            dataclasses.replace(base, num_routed_wires=36),
            dataclasses.replace(base, num_routed_wires=200),
            dataclasses.replace(base, max_quotient_degree_factor=6),
            dataclasses.replace(base, fri_config=FriConfig(rate_bits=9)),
            dataclasses.replace(base, fri_config=FriConfig(cap_height=9)),
            dataclasses.replace(base, fri_config=FriConfig(rate_bits=2)),
            dataclasses.replace(base, num_challenges=0),
        ]
        for bad in bad_cases:
            with pytest.raises(cp.ConfigError):
                cp.validate_circuit_config(bad)

    def test_security_accounting(self):
        cfg = cp.wormhole_leaf_circuit_config()
        # 28 queries x rate 3 + 16 PoW = 100 bits
        assert cfg.total_security_bits() == 100


class TestTransferProofJson:
    """Bounded parser for untrusted transfer-proof documents
    (reference `common/src/circuit.rs:20-370`)."""

    def test_parse_minimal_document(self):
        from qp_zk_circuits_tpu.utils import transfer_proof as tp

        doc = tp.TransferProofJson.from_json_str(
            '{"transfer_count":1,"state_root":"00","storage_proof":["00"],"indices":[0]}'
        )
        assert doc.transfer_count == 1
        assert doc.state_root == "00"
        assert doc.storage_proof == ["00"]
        assert doc.indices == [0]
        doc.validate()

    def test_raw_cap_checked_before_parse(self):
        from qp_zk_circuits_tpu.utils import transfer_proof as tp

        oversized = '{"junk":"' + "a" * tp.MAX_TRANSFER_PROOF_JSON_BYTES + '"}'
        with pytest.raises(tp.TransferProofError, match="refusing to parse"):
            tp.TransferProofJson.from_json_str(oversized)

    def test_per_field_bounds(self):
        from qp_zk_circuits_tpu.utils import transfer_proof as tp

        base = {
            "transfer_count": 1,
            "state_root": "00",
            "storage_proof": ["00"],
            "indices": [0],
        }
        import json as _json

        cases = [
            ({**base, "state_root": "f" * (tp.MAX_STATE_ROOT_HEX_LEN + 1)}, "state_root"),
            ({**base, "storage_proof": ["00"] * (tp.MAX_STORAGE_PROOF_NODES + 1)}, "nodes"),
            ({**base, "indices": [0] * (tp.MAX_MERKLE_INDICES + 1)}, "entries"),
            ({**base, "transfer_count": -1}, "u64"),
            ({**base, "transfer_count": 1 << 64}, "u64"),
            ({**base, "transfer_count": 1.5}, "u64"),
            ({**base, "indices": [-1]}, "non-negative"),
        ]
        for obj, needle in cases:
            with pytest.raises(tp.TransferProofError, match=needle):
                tp.TransferProofJson.from_json_str(_json.dumps(obj))
        # aggregate storage-proof byte cap
        node = "a" * 4096
        too_many = {**base, "storage_proof": [node] * (tp.MAX_STORAGE_PROOF_HEX_BYTES // 4096 + 1)}
        with pytest.raises(tp.TransferProofError, match="total bytes"):
            tp.TransferProofJson.from_json_str(_json.dumps(too_many))

    def test_missing_fields_and_wrong_shapes(self):
        from qp_zk_circuits_tpu.utils import transfer_proof as tp

        with pytest.raises(tp.TransferProofError, match="missing"):
            tp.TransferProofJson.from_json_str('{"transfer_count": 1}')
        with pytest.raises(tp.TransferProofError, match="object"):
            tp.TransferProofJson.from_json_str("[1, 2]")
        with pytest.raises(tp.TransferProofError, match="failed to parse"):
            tp.TransferProofJson.from_json_str("not json")

    def test_no_generic_parse_path(self):
        """The analogue of the reference's compile-fail pin: the only parse
        entry point is from_json_str (no from_dict / no Deserialize hook)."""
        from qp_zk_circuits_tpu.utils import transfer_proof as tp

        assert not hasattr(tp.TransferProofJson, "from_dict")
        assert not hasattr(tp.TransferProofJson, "from_json")
        assert not hasattr(tp.TransferProofJson, "parse")


class TestKeccak:
    def test_known_vectors(self):
        # keccak256("") and keccak256("abc") — published test vectors
        assert (
            keccak256(b"").hex()
            == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )
        assert (
            keccak256(b"abc").hex()
            == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
