"""Leaf verifier: canonical-profile checks + proof verification.

The reference ships a standalone no-std verifier that loads keccak-pinned
artifacts (`wormhole/verifier/src/lib.rs`): size caps, canonical pins,
config + PI-shape re-checks, then cryptographic verification. Artifact
byte-serialization and pinning live in `wormhole/artifacts.py`; this module
is the verification entry point."""

from __future__ import annotations

import numpy as np

from ..plonk.verifier import VerificationError, verify as plonk_verify
from . import inputs as wi


class WormholeVerifier:
    def __init__(self, data, enforce_security_floor: bool = True):
        """`data` is the leaf CircuitData (or a compatible verifier view)."""
        self.data = data
        self._enforce_floor = enforce_security_floor
        self._check_profile()

    def _check_profile(self):
        cfg = self.data.config
        if self._enforce_floor and cfg.total_security_bits() < wi.MIN_LEAF_SECURITY_BITS:
            raise VerificationError(
                f"leaf config security {cfg.total_security_bits()} below floor "
                f"{wi.MIN_LEAF_SECURITY_BITS}"
            )

    def verify(self, proof) -> wi.PublicCircuitInputs:
        """Verify and return the parsed public inputs."""
        if proof.public_inputs.shape != (wi.PUBLIC_INPUTS_FELTS_LEN,):
            raise VerificationError(
                f"expected {wi.PUBLIC_INPUTS_FELTS_LEN} public inputs, got "
                f"{proof.public_inputs.shape}"
            )
        plonk_verify(self.data, proof)
        return wi.PublicCircuitInputs.from_felts(proof.public_inputs)
