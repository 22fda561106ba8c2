"""ReducingGate: dense Horner alpha-reductions (the recursion row diet).

The gadget `ext_reduce_with_powers` packs ~38 base / ~27 extension
reduction steps per row at the canonical 135/60 config, replacing the
unrolled arithmetic-gate Horner chains that made the N=8 private batch
spill one degree bit past 2^16 (r3 census: 52,960 of 70,009 rows were
arith15). Counterpart of plonky2's ReducingExtensionGate (the engine the
reference builds on uses the same gate for its alpha-combinations).

Covers: value correctness vs host extension math (base + ext coeffs, row
boundaries, padding), proof round-trip, forged-accumulator rejection, and
the tiny-config arithmetic fallback.
"""

import numpy as np
import pytest

from qp_zk_circuits_tpu.fri.config import FriConfig, FriReductionStrategy
from qp_zk_circuits_tpu.plonk.builder import CircuitBuilder, PartialWitness
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.plonk.prover import prove
from qp_zk_circuits_tpu.plonk.verifier import VerificationError, verify
from qp_zk_circuits_tpu.recursion.ext_gadgets import (
    ExtTarget,
    ext_reduce_with_powers,
)

P = 0xFFFFFFFF00000001

TEST_FRI = FriConfig(
    rate_bits=3,
    cap_height=1,
    proof_of_work_bits=6,
    num_query_rounds=10,
    reduction_strategy=FriReductionStrategy(4, 5),
)
CANON = CircuitConfig(num_wires=135, num_routed_wires=60, num_challenges=2, fri_config=TEST_FRI)


def emul(x, y):
    return ((x[0] * y[0] + 7 * x[1] * y[1]) % P, (x[0] * y[1] + x[1] * y[0]) % P)


def host_reduce(alpha, coeff_vals):
    acc, apow = (0, 0), (1, 0)
    for v in coeff_vals:
        t = emul(apow, v)
        acc = ((acc[0] + t[0]) % P, (acc[1] + t[1]) % P)
        apow = emul(apow, alpha)
    return acc


def build_reduce_circuit(cfg, n, ext_mode, rng):
    b = CircuitBuilder(cfg)
    alpha_v = (int(rng.integers(0, P, dtype=np.uint64)), int(rng.integers(0, P, dtype=np.uint64)))
    alpha = ExtTarget(b.add_virtual_target(), b.add_virtual_target())
    pw = PartialWitness()
    pw.set_target(alpha[0], alpha_v[0])
    pw.set_target(alpha[1], alpha_v[1])
    coeffs, cvals = [], []
    for _ in range(n):
        if ext_mode:
            c = ExtTarget(b.add_virtual_target(), b.add_virtual_target())
            v = (int(rng.integers(0, P, dtype=np.uint64)), int(rng.integers(0, P, dtype=np.uint64)))
            pw.set_target(c[0], v[0])
            pw.set_target(c[1], v[1])
        else:
            c = b.add_virtual_target()
            v = (int(rng.integers(0, P, dtype=np.uint64)), 0)
            pw.set_target(c, v[0])
        coeffs.append(c)
        cvals.append(v)
    out = ext_reduce_with_powers(b, alpha, coeffs, ext=ext_mode)
    b.register_public_input(out[0])
    b.register_public_input(out[1])
    return b.build(), pw, host_reduce(alpha_v, cvals)


class TestReducingGate:
    # n values chosen to hit: multi-row + front padding (95), exactly one
    # full ext row boundary (27), sub-capacity single row (38 ext -> 2 rows),
    # and the < 8 arithmetic fallback (5)
    @pytest.mark.parametrize(
        "ext_mode,n", [(False, 95), (True, 27), (True, 38), (False, 5)]
    )
    def test_value_matches_host_extension_math(self, ext_mode, n, rng):
        data, pw, expect = build_reduce_circuit(CANON, n, ext_mode, rng)
        proof = prove(data, pw, seed=3)
        verify(data, proof)
        assert (int(proof.public_inputs[0]), int(proof.public_inputs[1])) == expect

    def test_gate_rows_dense(self, rng):
        """95 base coefficients must land in ceil(95/38)=3 reduce rows (the
        whole point: ~0.03 rows/coeff, not the ~2 slots/coeff of arith15)."""
        data, _, _ = build_reduce_circuit(CANON, 95, False, rng)
        reduce_rows = [g for g in data.row_gate if g.key().startswith("reduce")]
        assert len(reduce_rows) == 3
        assert len({g.key() for g in reduce_rows}) == 1  # single selector

    def test_forged_witness_unprovable(self, rng):
        """Forcing a wrong accumulator value must make proving fail (the
        constraints pin every intermediate)."""
        cfg = CANON
        b = CircuitBuilder(cfg)
        alpha = ExtTarget(b.add_virtual_target(), b.add_virtual_target())
        coeffs = [b.add_virtual_target() for _ in range(10)]
        out = ext_reduce_with_powers(b, alpha, coeffs, ext=False)
        # adversarial binding: force acc_out to a wrong constant
        b.connect(out[0], b.constant(12345))
        pw = PartialWitness()
        pw.set_target(alpha[0], 3)
        pw.set_target(alpha[1], 4)
        for c in coeffs:
            pw.set_target(c, 5)
        from qp_zk_circuits_tpu.plonk.builder import WitnessError

        with pytest.raises((WitnessError, VerificationError, AssertionError)):
            proof = prove(b.build(), pw, seed=1)
