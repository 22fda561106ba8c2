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

    def prove_inputs_batch(self, inputs_list, seed: int | None = None) -> list:
        """Prove many leaves in ONE device round-trip (vmapped fused prover).

        The TPU-native form of the reference's deployment-level parallel leaf
        proving (SURVEY §2.3: N≤64 independent leaf proofs proven
        concurrently): the whole batch shares one compiled graph and one
        tunnel round-trip, so per-proof cost amortizes toward pure compute."""
        pws = []
        for inputs in inputs_list:
            if len(inputs.private.siblings) > MAX_DEPTH:
                raise ValueError("proof depth exceeds MAX_DEPTH")
            pw = PartialWitness()
            fill_witness(pw, inputs, self.targets)
            pws.append(pw)
        return plonk_prover.prove_batch(self.data, pws, seed=seed)

    def prove_inputs_stream(self, inputs_list, batch: int = 16, seed: int | None = None):
        """Sustained-throughput proving: pipeline `batch`-sized chunks so
        host witness generation overlaps device execution (the deployment
        shape for miner-side leaf proving). Witness fills are lazy — chunk
        i+1's fills run while chunk i executes on device."""
        from ..plonk.prover_fused import prove_fused_stream

        def pw_gen():
            for inputs in inputs_list:
                if len(inputs.private.siblings) > MAX_DEPTH:
                    raise ValueError("proof depth exceeds MAX_DEPTH")
                pw = PartialWitness()
                fill_witness(pw, inputs, self.targets)
                yield pw

        return prove_fused_stream(
            self.data, pw_gen(), batch, seed=seed, total=len(inputs_list)
        )
