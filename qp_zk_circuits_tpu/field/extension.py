"""Quadratic extension F_{p^2} = F_p[X] / (X^2 - 7), the D = 2 extension.

The reference fixes D = 2 — "D=2 provides 100-bits of security" (reference
`common/src/circuit.rs:16`) — and Goldilocks admits X^2 - W with W = 7 (7 is a
quadratic non-residue; verified by Euler's criterion in the tests). Extension
points are where PLONK/FRI challenges (zeta, alphas, betas) live.

Host representation: numpy uint64 arrays with a trailing axis of size 2
``[..., (c0, c1)]`` meaning c0 + c1*X. Device representation: a pair of GF
lane-pairs (`GF2`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import gf_np as F
from . import goldilocks as gl
from .goldilocks import GF

W = 7  # X^2 = W


# ---------------------------------------------------------------------------
# host (numpy) ops — trailing axis 2


def ext(c0, c1=0) -> np.ndarray:
    return np.stack(
        [np.asarray(c0, dtype=np.uint64), np.asarray(np.uint64(c1) * np.ones_like(np.asarray(c0, dtype=np.uint64)), dtype=np.uint64)],
        axis=-1,
    )


def from_base(c0) -> np.ndarray:
    c0 = np.asarray(c0, dtype=np.uint64)
    return np.stack([c0, np.zeros_like(c0)], axis=-1)


_P_INT = 0xFFFFFFFF00000001


def _is_scalar_pair(a) -> bool:
    return isinstance(a, np.ndarray) and a.shape == (2,)


def pair(x) -> tuple:
    """np (2,) extension value -> (int, int) tuple (the host verifier's
    scalar domain: pure Python-int arithmetic, no numpy packing)."""
    if type(x) is tuple:
        return x
    a = np.asarray(x, dtype=np.uint64).reshape(2)
    return (int(a[0]), int(a[1]))


def unpair(t) -> np.ndarray:
    return np.array([t[0], t[1]], dtype=np.uint64)


def add(a, b):
    if type(a) is tuple:
        return ((a[0] + b[0]) % _P_INT, (a[1] + b[1]) % _P_INT)
    if _is_scalar_pair(a) and _is_scalar_pair(b):
        return np.array(
            [(int(a[0]) + int(b[0])) % _P_INT, (int(a[1]) + int(b[1])) % _P_INT],
            dtype=np.uint64,
        )
    return np.stack([F.add(a[..., 0], b[..., 0]), F.add(a[..., 1], b[..., 1])], axis=-1)


def sub(a, b):
    if type(a) is tuple:
        return ((a[0] - b[0]) % _P_INT, (a[1] - b[1]) % _P_INT)
    if _is_scalar_pair(a) and _is_scalar_pair(b):
        return np.array(
            [(int(a[0]) - int(b[0])) % _P_INT, (int(a[1]) - int(b[1])) % _P_INT],
            dtype=np.uint64,
        )
    return np.stack([F.sub(a[..., 0], b[..., 0]), F.sub(a[..., 1], b[..., 1])], axis=-1)


def neg(a):
    return np.stack([F.neg(a[..., 0]), F.neg(a[..., 1])], axis=-1)


def mul(a, b):
    if type(a) is tuple:
        a0, a1 = a
        b0, b1 = b
        return ((a0 * b0 + W * a1 * b1) % _P_INT, (a0 * b1 + a1 * b0) % _P_INT)
    if _is_scalar_pair(a) and _is_scalar_pair(b):
        a0, a1, b0, b1 = int(a[0]), int(a[1]), int(b[0]), int(b[1])
        return np.array(
            [(a0 * b0 + W * a1 * b1) % _P_INT, (a0 * b1 + a1 * b0) % _P_INT],
            dtype=np.uint64,
        )
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = F.add(F.mul(a0, b0), F.mul(np.uint64(W), F.mul(a1, b1)))
    c1 = F.add(F.mul(a0, b1), F.mul(a1, b0))
    return np.stack([c0, c1], axis=-1)


def scalar_mul(a, s):
    """Multiply extension element(s) by base-field scalar(s)."""
    if type(a) is tuple:
        si = int(s)
        return (a[0] * si % _P_INT, a[1] * si % _P_INT)
    if _is_scalar_pair(a) and np.ndim(s) == 0:
        si = int(s)
        return np.array(
            [int(a[0]) * si % _P_INT, int(a[1]) * si % _P_INT], dtype=np.uint64
        )
    s = np.asarray(s, dtype=np.uint64)
    return np.stack([F.mul(a[..., 0], s), F.mul(a[..., 1], s)], axis=-1)


def sqr(a):
    return mul(a, a)


def inv(a):
    """(a0 + a1 X)^-1 = (a0 - a1 X) / (a0^2 - W a1^2)."""
    if type(a) is tuple:
        a0, a1 = a
        ninv = pow((a0 * a0 - W * a1 * a1) % _P_INT, _P_INT - 2, _P_INT)
        return (a0 * ninv % _P_INT, (-a1) * ninv % _P_INT)
    if _is_scalar_pair(a):
        a0, a1 = int(a[0]), int(a[1])
        ninv = pow((a0 * a0 - W * a1 * a1) % _P_INT, _P_INT - 2, _P_INT)
        return np.array([a0 * ninv % _P_INT, (-a1) * ninv % _P_INT], dtype=np.uint64)
    a0, a1 = a[..., 0], a[..., 1]
    norm = F.sub(F.mul(a0, a0), F.mul(np.uint64(W), F.mul(a1, a1)))
    ninv = F.inv(norm)
    return np.stack([F.mul(a0, ninv), F.mul(F.neg(a1), ninv)], axis=-1)


def pow_scalar(a, e: int):
    result = from_base(np.ones_like(a[..., 0]))
    acc = a.copy()
    e = int(e)
    while e > 0:
        if e & 1:
            result = mul(result, acc)
        e >>= 1
        if e:
            acc = mul(acc, acc)
    return result


def powers(base, n: int) -> np.ndarray:
    """[1, b, b^2, ...] for a single extension element base, shape (n, 2)."""
    out = np.empty((n, 2), dtype=np.uint64)
    acc = ext(np.uint64(1))
    for i in range(n):
        out[i] = acc
        acc = mul(acc, base)
    return out


def eq(a, b) -> np.ndarray:
    return (a[..., 0] == b[..., 0]) & (a[..., 1] == b[..., 1])


def powers_table(base, n: int) -> np.ndarray:
    """[1, b, ..., b^(n-1)] built from two small sequential tables + one
    vectorised outer product (O(sqrt n) sequential host muls)."""
    if n <= 64:
        return powers(base, n)
    half_bits = ((n - 1).bit_length() + 1) // 2
    lo_size = 1 << half_bits
    lo = powers(base, lo_size)
    z_hi = pow_scalar(base, lo_size)
    hi_size = -(-n // lo_size)
    hi = powers(z_hi, hi_size)
    full = mul(
        np.broadcast_to(hi[:, None, :], (hi_size, lo_size, 2)),
        np.broadcast_to(lo[None, :, :], (hi_size, lo_size, 2)),
    )
    return full.reshape(-1, 2)[:n]


def sum_axis0(a: np.ndarray) -> np.ndarray:
    """Field sum of (..., 2) extension elements along axis 0 (tree halving)."""
    cur = a
    while cur.shape[0] > 1:
        half = cur.shape[0] // 2
        s = add(cur[:half], cur[half : 2 * half])
        if cur.shape[0] % 2:
            s = np.concatenate([s, cur[2 * half :]], axis=0)
        cur = s
    return cur[0]


def rand(shape, rng: np.random.Generator) -> np.ndarray:
    return np.stack([F.rand_felts(shape, rng), F.rand_felts(shape, rng)], axis=-1)


# ---------------------------------------------------------------------------
# device (JAX) ops


class GF2(NamedTuple):
    c0: GF
    c1: GF

    @property
    def shape(self):
        return self.c0.lo.shape


def j_from_base(a: GF) -> GF2:
    return GF2(a, gl.zeros(a.shape))


def j_from_u64(x: np.ndarray) -> GF2:
    """numpy (..., 2) u64 -> GF2."""
    return GF2(gl.from_u64(x[..., 0]), gl.from_u64(x[..., 1]))


def j_to_u64(a: GF2) -> np.ndarray:
    return np.stack([gl.to_u64(a.c0), gl.to_u64(a.c1)], axis=-1)


def j_add(a: GF2, b: GF2) -> GF2:
    return GF2(gl.add(a.c0, b.c0), gl.add(a.c1, b.c1))


def j_sub(a: GF2, b: GF2) -> GF2:
    return GF2(gl.sub(a.c0, b.c0), gl.sub(a.c1, b.c1))


def j_mul(a: GF2, b: GF2) -> GF2:
    t00 = gl.mul(a.c0, b.c0)
    t11 = gl.mul(a.c1, b.c1)
    c0 = gl.add(t00, gl.mul_const(t11, W))
    c1 = gl.add(gl.mul(a.c0, b.c1), gl.mul(a.c1, b.c0))
    return GF2(c0, c1)


def j_scalar_mul(a: GF2, s: GF) -> GF2:
    return GF2(gl.mul(a.c0, s), gl.mul(a.c1, s))


def j_select(mask, a: GF2, b: GF2) -> GF2:
    return GF2(gl.select(mask, a.c0, b.c0), gl.select(mask, a.c1, b.c1))


def j_sqr(a: GF2) -> GF2:
    return j_mul(a, a)


def j_sum_tree(a: GF2, axis) -> GF2:
    return GF2(gl.sum_tree(a.c0, axis), gl.sum_tree(a.c1, axis))


def j_neg(a: GF2) -> GF2:
    return GF2(gl.neg(a.c0), gl.neg(a.c1))


def j_inv(a: GF2) -> GF2:
    """Vectorised extension inverse via the norm map + one Fermat chain."""
    norm = gl.sub(gl.sqr(a.c0), gl.mul_const(gl.sqr(a.c1), W))
    ninv = gl.inv(norm)
    return GF2(gl.mul(a.c0, ninv), gl.mul(gl.neg(a.c1), ninv))


def j_scalar_base_mul(a: GF, b: GF2) -> GF2:
    """base-field array a times extension b (elementwise)."""
    return GF2(gl.mul(a, b.c0), gl.mul(a, b.c1))


def j_constant(c0: int, c1: int = 0, shape=()) -> GF2:
    return GF2(gl.constant(c0, shape), gl.constant(c1, shape))
