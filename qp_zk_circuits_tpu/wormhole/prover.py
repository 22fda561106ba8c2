"""Leaf prover: WormholeProver{new, commit, prove} (reference
`wormhole/prover/src/lib.rs`).

Always rebuilds the circuit from source — prover data is never deserialized
from disk (poisoned-artifact exfiltration rationale, reference
`prover/src/lib.rs:12-17`)."""

from __future__ import annotations

import numpy as np

from ..plonk import prover as plonk_prover
from ..plonk.builder import PartialWitness
from .circuit_inputs import CircuitInputs, MAX_DEPTH
from .leaf_circuit import WormholeCircuit, fill_witness


def build_fresh(config=None) -> "WormholeProver":
    return WormholeProver(config)


class WormholeProver:
    def __init__(self, config=None):
        circuit = WormholeCircuit(config)
        self.targets = circuit.targets
        self.data = circuit.build()
        self._pw: PartialWitness | None = None

    def commit(self, inputs: CircuitInputs) -> "WormholeProver":
        """Fill the witness (fail-fast: depth preflight, digest validation)."""
        if len(inputs.private.siblings) > MAX_DEPTH:
            raise ValueError("proof depth exceeds MAX_DEPTH")
        pw = PartialWitness()
        fill_witness(pw, inputs, self.targets)
        self._pw = pw
        return self

    def prove(self, seed: int | None = None):
        assert self._pw is not None, "commit() must be called before prove()"
        proof = plonk_prover.prove(self.data, self._pw, seed=seed)
        self._pw = None
        return proof

    def prove_inputs(self, inputs: CircuitInputs, seed: int | None = None):
        return self.commit(inputs).prove(seed=seed)
