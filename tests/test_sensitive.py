"""Secret hygiene: redaction, scrubbing, and best-effort leak scanning.

Counterpart of the reference's zeroization + redaction harnesses:
  * heap-zeroization scanning allocator — `wormhole/circuit/tests/
    heap_zeroization.rs:1-120` (Python analogue: scrub-on-drop semantics +
    scanning every user-facing string surface for the secret pattern);
  * redacting Debug impls — `circuit/src/inputs.rs:98-114`,
    `sensitive.rs:82-129`, `prover/src/lib.rs:104-117`.
"""

import gc

import numpy as np
import pytest

from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.circuit_inputs import CircuitInputs
from qp_zk_circuits_tpu.wormhole.sensitive import Secret, SensitiveFelts

SECRET_HEX = "4c8587bd422e01d961acdc75e7d66f6761b7af7c9b1864a492f369c9d6724f05"


def leak_surfaces(obj):
    """Every user-facing string surface of an object graph: repr, str, and
    (for dataclass-like things) the reprs of attribute values one level deep."""
    out = [repr(obj), str(obj)]
    for name in dir(obj):
        if name.startswith("_"):
            continue
        try:
            val = getattr(obj, name)
        except Exception as e:
            out.append(str(e))
            continue
        if not callable(val):
            out.append(repr(val))
    return out


def assert_no_secret(text_surfaces, secret_bytes: bytes):
    needles = [
        secret_bytes.hex(),
        secret_bytes.hex().upper(),
        str(list(secret_bytes)),
        # the felt (u64-limb) rendering of the secret
        str(list(np.frombuffer(secret_bytes, dtype="<u8"))),
    ]
    for surface in text_surfaces:
        for needle in needles:
            assert needle not in surface, f"secret leaked into: {surface[:120]}..."


class TestSecret:
    def test_repr_redacted(self):
        s = Secret.from_hex(SECRET_HEX)
        assert_no_secret(leak_surfaces(s), bytes.fromhex(SECRET_HEX))
        assert "REDACTED" in repr(s)

    def test_scrub_zeroes_and_blocks_exposure(self):
        s = Secret.from_hex(SECRET_HEX)
        buf = s._buf  # keep a reference to the owned buffer
        s.scrub()
        assert not buf.any()
        with pytest.raises(ValueError, match="scrubbed"):
            s.expose_digest()
        with pytest.raises(ValueError, match="scrubbed"):
            s.expose_felts()

    def test_del_scrubs_owned_buffer(self):
        s = Secret.from_hex(SECRET_HEX)
        buf = s._buf
        del s
        gc.collect()
        assert not buf.any()

    def test_not_hashable_move_only_discipline(self):
        s = Secret.from_hex(SECRET_HEX)
        with pytest.raises(TypeError):
            hash(s)

    def test_constant_time_eq(self):
        a = Secret.from_hex(SECRET_HEX)
        b = Secret.from_hex(SECRET_HEX)
        c = Secret(bytes(32))
        assert a == b
        assert not (a == c)

    def test_noncanonical_limbs_rejected(self):
        bad = b"\xff" * 8 + bytes(24)
        with pytest.raises(ValueError, match="canonical"):
            Secret(bad)

    def test_validation_errors_do_not_echo_secret(self):
        """Exception text raised on invalid sibling counts etc. must not
        contain the secret (reference: errors carry no witness data)."""
        inputs = th.two_real_leaves_same_block()[0]
        secret_bytes = inputs.private.secret.expose_digest()
        try:
            # malformed inputs: truncated digest triggers a validation error
            from qp_zk_circuits_tpu.wormhole.circuit_inputs import PrivateCircuitInputs

            PrivateCircuitInputs(
                secret=Secret(secret_bytes),
                transfer_count=inputs.private.transfer_count,
                unspendable_account=b"\x00" * 5,  # wrong length
                parent_hash=b"\x00" * 32,
                state_root=b"\x00" * 32,
                extrinsics_root=b"\x00" * 32,
                digest=b"\x00" * 110,
                input_amount=1,
                zk_tree_root=b"\x00" * 32,
                siblings=[],
                positions=[],
            )
        except Exception as e:
            assert_no_secret([str(e), repr(e)], secret_bytes)


class TestSensitiveFelts:
    def test_repr_redacted_and_scrub(self):
        felts = SensitiveFelts(np.arange(8, dtype=np.uint64) + 12345)
        assert "REDACTED" in repr(felts)
        assert "12345" not in repr(felts)
        arr = felts._arr
        felts.scrub()
        assert not arr.any()
        with pytest.raises(ValueError, match="scrubbed"):
            felts.view()


class TestWitnessRedaction:
    def test_circuit_inputs_surfaces_redacted(self):
        inputs = th.two_real_leaves_same_block()[0]
        secret_bytes = inputs.private.secret.expose_digest()
        assert_no_secret([repr(inputs), str(inputs)], secret_bytes)
        assert_no_secret([repr(inputs.private), str(inputs.private)], secret_bytes)

    def test_prover_repr_redacted(self):
        """The committed witness must not leak through the prover's repr
        (reference `prover/src/lib.rs:104-117`)."""
        from qp_zk_circuits_tpu.wormhole.prover import WormholeProver

        # repr of an unbuilt prover class: cheap check that no custom __repr__
        # dumps witness state (the default object repr is fine)
        assert "secret" not in repr(WormholeProver).lower()
