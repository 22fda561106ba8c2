"""Native witness-tape VM vs the Python generator replay (host-only).

The tape (plonk/witness_tape.py + native/witness_tape.c) must reproduce the
Python replay's values bit-exactly for every opcode, and enforce the same
strict conflict/range semantics. No device work — safe in the CPU pass.
"""

import numpy as np
import pytest

from qp_zk_circuits_tpu import native as nat
from qp_zk_circuits_tpu.plonk import witness_tape as wt
from qp_zk_circuits_tpu.plonk.builder import (
    CircuitBuilder,
    PartialWitness,
    WitnessError,
    run_generators,
    witness_root_values,
)
from qp_zk_circuits_tpu.plonk.config import CircuitConfig
from qp_zk_circuits_tpu.recursion.ext_gadgets import ext_inverse

pytestmark = pytest.mark.skipif(not nat.available(), reason="no native lib")


def _build_all_opcode_circuit():
    """One circuit touching every tape opcode: const, fmadd, inv, invz,
    split64, splitbits (range_check), poseidon (permute), extinv."""
    b = CircuitBuilder(CircuitConfig())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    m = b.mul(x, y)                        # fmadd
    s = b.add(m, b.constant(12345))        # const + fmadd
    inv = b.inverse(s)                     # inv
    eq = b.is_equal(x, y)                  # invz
    lo, hi, _bits = b.split_64(s)          # split64 + splitbits
    b.range_check(x, 16)                   # splitbits
    digest = b.hash_n_to_hash_no_pad([x, y, m, s])  # poseidon rows
    e0 = b.add_virtual_target()
    e1 = b.add_virtual_target()
    ei = ext_inverse(b, (e0, e1))          # extinv
    b.register_public_inputs([m, inv, eq, lo, hi, digest[0], ei[0], ei[1]])
    data = b.build(shape_only=True)
    return data, (x, y, e0, e1)


def _pw(targets, xv, yv, e0v, e1v):
    x, y, e0, e1 = targets
    pw = PartialWitness()
    pw.set_target(x, xv)
    pw.set_target(y, yv)
    pw.set_target(e0, e0v)
    pw.set_target(e1, e1v)
    return pw


def test_tape_matches_python_replay_all_opcodes():
    data, targets = _build_all_opcode_circuit()
    pw = _pw(targets, 777, 777, 5, 9)
    arr_py = witness_root_values(data, pw)  # records program (Python path)
    arr_tape = witness_root_values(data, pw)  # tape path
    cached = data.__dict__.get("_witness_tape")
    assert cached is not None and cached[1] is not None, "tape did not compile"
    assert np.array_equal(arr_py, arr_tape)
    values = run_generators(data, pw)
    for r, v in values.items():
        assert int(arr_tape[r]) == v

    # second witness through the same tape
    pw2 = _pw(targets, 31337, 99, 123456789, 1)
    arr2 = witness_root_values(data, pw2)
    values2 = run_generators(data, pw2)
    for r, v in values2.items():
        assert int(arr2[r]) == v


def test_tape_range_check_failure():
    data, targets = _build_all_opcode_circuit()
    pw = _pw(targets, 3, 4, 1, 1)
    witness_root_values(data, pw)  # record
    bad = _pw(targets, 1 << 20, 4, 1, 1)  # x fails range_check(x, 16)
    with pytest.raises((WitnessError, ValueError), match="range check"):
        witness_root_values(data, bad)


def test_tape_conflict_detection():
    b = CircuitBuilder(CircuitConfig())
    x = b.add_virtual_target()
    y = b.mul(x, x)
    out = b.add_virtual_target()
    b.connect(y, out)
    data = b.build(shape_only=True)
    pw = PartialWitness()
    pw.set_target(x, 3)
    witness_root_values(data, pw)  # record: y = 9
    bad = PartialWitness()
    bad.set_target(x, 3)
    bad.set_target(out, 10)  # conflicts with generated 9
    with pytest.raises(WitnessError, match="conflict"):
        witness_root_values(data, bad)


def test_tape_requires_matching_keyset():
    """A different seed-target set must not run a stale tape program."""
    data, targets = _build_all_opcode_circuit()
    pw = _pw(targets, 5, 6, 7, 8)
    witness_root_values(data, pw)  # record + compile
    assert wt.run_tape(data, _pw(targets, 5, 6, 7, 8)) is not None
    extra = PartialWitness()
    extra.values = dict(pw.values)
    extra.set_target(data.num_targets - 1, 42)  # extra seeded target
    assert wt.run_tape(data, extra) is None  # keyset mismatch -> fallback
