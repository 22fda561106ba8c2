"""Host-side (numpy) Goldilocks field arithmetic, vectorised over uint64 arrays.

The Goldilocks prime is p = 2^64 - 2^32 + 1 (phi = 2^32, p = phi^2 - phi + 1),
the same field the reference consumes throughout (modulus constants pinned at
reference `common/src/zk_merkle.rs:41` and `wormhole/inputs/src/lib.rs:23`).

All values are stored **canonical** (in [0, p)) as numpy uint64. Multiplication
uses the standard 2^64 ≡ 2^32 - 1 (mod p), 2^96 ≡ -1 (mod p) folding identity;
`from_noncanonical_u64` reduces lazily-encoded u64s (so `p` aliases to `0` —
the semantics the reference's encoding-safety suite pins, reference
`wormhole/tests/tests/encoding_safety.rs:40-69`).

This module is the oracle for the JAX/TPU implementation in `goldilocks.py`:
they are tested element-for-element against each other and against Python-int
arithmetic.
"""

from __future__ import annotations

import functools

import numpy as np


def _wrapping(fn):
    """Silence numpy overflow warnings — u64 wraparound is intended here."""

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)

    return inner

P = np.uint64(0xFFFFFFFF00000001)  # 2^64 - 2^32 + 1
EPSILON = np.uint64(0xFFFFFFFF)  # 2^32 - 1  ==  2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)
# Multiplicative group order p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
TWO_ADICITY = 32
# Generator of F_p^* (order p-1); 7 is the standard Goldilocks generator.
MULTIPLICATIVE_GROUP_GENERATOR = np.uint64(7)
# Primitive 2^32-nd root of unity: g^((p-1)/2^32) with g = 7.
POWER_OF_TWO_GENERATOR = np.uint64(0x185629DCDA58878C)

_U64 = np.uint64


def asfelt(x) -> np.ndarray:
    """Coerce ints / arrays to uint64 felts WITHOUT reduction (must be canonical)."""
    return np.asarray(x, dtype=np.uint64)


def from_noncanonical_u64(x) -> np.ndarray:
    """Reduce arbitrary u64s mod p (x in [p, 2^64) aliases down by subtracting p)."""
    x = np.asarray(x, dtype=np.uint64)
    return np.where(x >= P, x - P, x)


def from_int(x: int) -> np.uint64:
    return np.uint64(x % 0xFFFFFFFF00000001)


def is_canonical(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64) < P


@_wrapping
def add(a, b) -> np.ndarray:
    """Canonical a + b mod p."""
    if np.ndim(a) == 0 and np.ndim(b) == 0:
        return np.uint64((int(a) + int(b)) % 0xFFFFFFFF00000001)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    s = a + b  # wraps mod 2^64
    over = s < a  # carry out of 2^64  ->  add back 2^64 mod p = EPSILON
    s = s + np.where(over, EPSILON, _U64(0))
    # one conditional subtract brings us canonical (s < 2p always here)
    return np.where(s >= P, s - P, s)


@_wrapping
def sub(a, b) -> np.ndarray:
    """Canonical a - b mod p."""
    if np.ndim(a) == 0 and np.ndim(b) == 0:
        return np.uint64((int(a) - int(b)) % 0xFFFFFFFF00000001)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    d = a - b  # wraps
    borrow = a < b  # borrowed 2^64 -> subtract EPSILON to land on a - b + p
    return d - np.where(borrow, EPSILON, _U64(0))


def neg(a) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    return np.where(a == 0, _U64(0), P - a)


@_wrapping
def _mul_wide(a: np.ndarray, b: np.ndarray):
    """64x64 -> 128 bit product as (lo64, hi64), via 32-bit half products."""
    a0 = a & MASK32
    a1 = a >> _U64(32)
    b0 = b & MASK32
    b1 = b >> _U64(32)
    ll = a0 * b0  # < 2^64, exact
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl, may carry out of 64 bits
    mid = lh + hl
    mid_carry = (mid < lh).astype(np.uint64)  # contributes 2^96
    lo = ll + ((mid & MASK32) << _U64(32))
    lo_carry = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> _U64(32)) + (mid_carry << _U64(32)) + lo_carry
    return lo, hi


@_wrapping
def reduce128(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Reduce a 128-bit value (lo + hi*2^64) to a canonical felt.

    Uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p):
      n ≡ lo - hi_hi + (hi_lo * (2^32-1)).
    """
    hi_hi = hi >> _U64(32)
    hi_lo = hi & MASK32
    t0 = lo - hi_hi
    borrow = lo < hi_hi
    t0 = t0 - np.where(borrow, EPSILON, _U64(0))
    t1 = hi_lo * EPSILON  # < 2^64, exact
    t2 = t0 + t1
    over = t2 < t0
    t2 = t2 + np.where(over, EPSILON, _U64(0))
    return np.where(t2 >= P, t2 - P, t2)


def mul(a, b) -> np.ndarray:
    if np.ndim(a) == 0 and np.ndim(b) == 0:
        # scalar fast path: Python-int mulmod (~100x the numpy scalar chain)
        return np.uint64(int(a) * int(b) % 0xFFFFFFFF00000001)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    lo, hi = _mul_wide(a, b)
    return reduce128(lo, hi)


def sqr(a) -> np.ndarray:
    return mul(a, a)


def pow_scalar(base, exp: int):
    """base ** exp mod p, exp a Python int >= 0 (vectorised over base).

    Scalar bases use Python-int pow (~1 us) instead of a ~64-step numpy
    square-and-multiply chain (~1 ms) — the host verifier's hottest call."""
    e = int(exp)
    if np.ndim(base) == 0:
        return np.uint64(pow(int(base), e, 0xFFFFFFFF00000001))
    result = np.full_like(np.asarray(base, dtype=np.uint64), _U64(1))
    acc = np.asarray(base, dtype=np.uint64).copy()
    while e > 0:
        if e & 1:
            result = mul(result, acc)
        e >>= 1
        if e:
            acc = mul(acc, acc)
    return result


def inv(a) -> np.ndarray:
    """Multiplicative inverse by Fermat: a^(p-2). Vectorised; inv(0) = 0."""
    return pow_scalar(a, 0xFFFFFFFF00000001 - 2)


def batch_inv(a: np.ndarray) -> np.ndarray:
    """Montgomery batch inversion over a flat array (single Fermat exponentiation)."""
    a = np.asarray(a, dtype=np.uint64).ravel()
    n = a.shape[0]
    if n == 0:
        return a
    prefix = np.empty(n, dtype=np.uint64)
    acc = _U64(1)
    for i in range(n):
        prefix[i] = acc
        acc = mul(acc, a[i])
    acc_inv = inv(acc)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n - 1, -1, -1):
        out[i] = mul(acc_inv, prefix[i])
        acc_inv = mul(acc_inv, a[i])
    return out


@functools.cache
def primitive_root_of_unity(n_log: int) -> np.uint64:
    """Primitive 2^n_log-th root of unity."""
    assert 0 <= n_log <= TWO_ADICITY
    g = POWER_OF_TWO_GENERATOR
    return np.uint64(pow_scalar(g, 1 << (TWO_ADICITY - n_log)))


def two_adic_subgroup(n_log: int) -> np.ndarray:
    """All 2^n_log-th roots of unity in order [1, w, w^2, ...]."""
    w = primitive_root_of_unity(n_log)
    n = 1 << n_log
    out = np.empty(n, dtype=np.uint64)
    acc = _U64(1)
    for i in range(n):
        out[i] = acc
        acc = mul(acc, w)
    return out


def powers(base, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] for a scalar base."""
    out = np.empty(n, dtype=np.uint64)
    acc = _U64(1)
    b = np.uint64(base)
    for i in range(n):
        out[i] = acc
        acc = mul(acc, b)
    return out


def rand_felts(shape, rng: np.random.Generator) -> np.ndarray:
    """Uniform canonical felts by rejection sampling u64s."""
    out = rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)
    bad = out >= P
    while np.any(bad):
        out[bad] = rng.integers(0, 1 << 64, size=int(bad.sum()), dtype=np.uint64)
        bad = out >= P
    return out


def powers_table(base, n: int) -> np.ndarray:
    """[1, b, ..., b^(n-1)] with O(sqrt n) sequential muls (split tables)."""
    if n <= 64:
        return powers(base, n)
    half_bits = ((n - 1).bit_length() + 1) // 2
    lo_size = 1 << half_bits
    lo = powers(base, lo_size)
    b_hi = pow_scalar(np.uint64(base), lo_size)
    hi_size = -(-n // lo_size)
    hi = powers(b_hi, hi_size)
    full = mul(hi[:, None], lo[None, :])
    return full.reshape(-1)[:n]
