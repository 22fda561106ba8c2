"""Quadratic-extension arithmetic on target pairs (c0, c1).

The verifier's algebra at zeta lives in F_{p^2} = F_p[X]/(X^2 - 7); these
gadgets express it over base-field arithmetic gates: an extension mul is
5 base muls, an inverse is a witness + product constraint."""

from __future__ import annotations

from ..field.extension import W
from ..plonk.builder import CircuitBuilder

P = 0xFFFFFFFF00000001


class ExtTarget(tuple):
    """(c0, c1) target pair."""

    def __new__(cls, c0: int, c1: int):
        return super().__new__(cls, (c0, c1))

    @property
    def c0(self):
        return self[0]

    @property
    def c1(self):
        return self[1]


def ext_from_base(b: CircuitBuilder, t: int) -> ExtTarget:
    return ExtTarget(t, b.zero())

def ext_zero(b: CircuitBuilder) -> ExtTarget:
    return ExtTarget(b.zero(), b.zero())


def ext_one(b: CircuitBuilder) -> ExtTarget:
    return ExtTarget(b.one(), b.zero())


def ext_constant(b: CircuitBuilder, c0: int, c1: int = 0) -> ExtTarget:
    return ExtTarget(b.constant(c0), b.constant(c1))


def ext_virtual(b: CircuitBuilder) -> ExtTarget:
    return ExtTarget(b.add_virtual_target(), b.add_virtual_target())


def ext_add(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.add(x[0], y[0]), b.add(x[1], y[1]))


def ext_sub(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.sub(x[0], y[0]), b.sub(x[1], y[1]))


def ext_mul(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    """(x0 y0 + 7 x1 y1, x0 y1 + x1 y0)."""
    t00 = b.mul(x[0], y[0])
    t11 = b.mul(x[1], y[1])
    c0 = b._arith_op(7, 1, t11, b.one(), t00)  # 7*t11 + t00
    t01 = b.mul(x[0], y[1])
    c1 = b.mul_add(x[1], y[0], t01)
    return ExtTarget(c0, c1)


def ext_scalar_mul(b: CircuitBuilder, x: ExtTarget, s: int) -> ExtTarget:
    """Multiply by a base-field TARGET s."""
    return ExtTarget(b.mul(x[0], s), b.mul(x[1], s))


def ext_mul_const(b: CircuitBuilder, x: ExtTarget, c: int) -> ExtTarget:
    """Multiply by a Python-int constant."""
    return ExtTarget(b.mul_const(c, x[0]), b.mul_const(c, x[1]))


def ext_inverse(b: CircuitBuilder, x: ExtTarget) -> ExtTarget:
    """Witnessed inverse with in-circuit product check x * inv == 1
    (unprovable when x == 0)."""
    inv = ext_virtual(b)

    def gen(get, x=x):
        x0, x1 = get(x[0]), get(x[1])
        if type(x0) is int:
            norm = (x0 * x0 - W * x1 * x1) % P
            ninv = pow(norm, P - 2, P)
            return [(x0 * ninv) % P, (P - x1) * ninv % P]
        # batched witness mode: (K,) uint64 vectors through field helpers
        import numpy as np

        from ..field import gf_np as F

        x0 = np.asarray(x0, np.uint64)
        x1 = np.asarray(x1, np.uint64)
        norm = F.sub(F.mul(x0, x0), F.mul(np.uint64(W), F.mul(x1, x1)))
        ninv = F.inv(norm)
        return [F.mul(x0, ninv), F.mul(F.neg(x1), ninv)]

    b._simple_generator(
        [x[0], x[1]], gen, [inv[0], inv[1]], desc=("extinv", x[0], x[1])
    )
    prod = ext_mul(b, x, inv)
    b.assert_one(prod[0])
    b.assert_zero(prod[1])
    return inv


def ext_div(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ext_mul(b, x, ext_inverse(b, y))


def ext_select(b: CircuitBuilder, flag: int, x: ExtTarget, y: ExtTarget) -> ExtTarget:
    return ExtTarget(b.select(flag, x[0], y[0]), b.select(flag, x[1], y[1]))


def ext_eq_assert(b: CircuitBuilder, x: ExtTarget, y: ExtTarget) -> None:
    b.connect(x[0], y[0])
    b.connect(x[1], y[1])


def ext_exp_pow2(b: CircuitBuilder, x: ExtTarget, k: int) -> ExtTarget:
    for _ in range(k):
        x = ext_mul(b, x, x)
    return x
