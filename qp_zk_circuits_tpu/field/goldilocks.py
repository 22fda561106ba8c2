"""Goldilocks field arithmetic in JAX, as uint32-pair lanes.

TPU has no native 64-bit integer path, so a field element is carried as two
uint32 arrays ``(lo, hi)`` with value ``lo + hi * 2^32`` — a structure-of-arrays
layout that vectorises on the 8x128 VPU and keeps the last dimension free for
lane tiling (cf. /opt/skills/guides/pallas_guide.md, Tiling Constraints).

All public ops take and return **canonical** values (in ``[0, p)``). The
multiply uses the 2^64 ≡ 2^32-1, 2^96 ≡ -1 (mod p) folding identity, mirroring
the host oracle in `gf_np.py` limb for limb; the two implementations are tested
element-wise against each other and against Python-int arithmetic.

This module is pure jnp (VPU-friendly elementwise ops) and is what the NTT,
Poseidon2, FRI-fold and quotient kernels build on; hot fused versions live in
`qp_zk_circuits_tpu.ops`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import gf_np

MASK32 = np.uint32(0xFFFFFFFF)
EPS32 = np.uint32(0xFFFFFFFF)  # EPSILON = 2^32 - 1 as a u32
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)

_u32 = jnp.uint32


class GF(NamedTuple):
    """A Goldilocks element (or array thereof) as (lo, hi) uint32 lanes."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return self.lo.shape

    def __len__(self):
        return self.lo.shape[0]

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])


# ---------------------------------------------------------------------------
# conversions


def from_u64(x) -> GF:
    """numpy uint64 array (canonical) -> GF device pair."""
    x = np.asarray(x, dtype=np.uint64)
    return GF(
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def to_u64(a: GF) -> np.ndarray:
    """GF -> numpy uint64 array (device->host transfer)."""
    lo = np.asarray(a.lo, dtype=np.uint64)
    hi = np.asarray(a.hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def constant(value: int, shape=()) -> GF:
    v = int(value) % 0xFFFFFFFF00000001
    return GF(
        jnp.full(shape, np.uint32(v & 0xFFFFFFFF), dtype=_u32),
        jnp.full(shape, np.uint32(v >> 32), dtype=_u32),
    )


def zeros(shape=()) -> GF:
    return GF(jnp.zeros(shape, _u32), jnp.zeros(shape, _u32))


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, _u32), jnp.zeros(shape, _u32))


# ---------------------------------------------------------------------------
# pair primitives


def _addc(x, y):
    """u32 add with carry out: (sum, carry∈{0,1})."""
    s = x + y
    return s, (s < x).astype(_u32)


def _pair_add(alo, ahi, blo, bhi):
    """64-bit add of pairs -> (lo, hi, carry_out)."""
    lo, c = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi2, c2 = _addc(hi1, c)
    return lo, hi2, c1 + c2


def _pair_sub(alo, ahi, blo, bhi):
    """64-bit sub of pairs -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(_u32)
    hi = ahi - bhi - b0
    borrow = ((ahi < bhi) | ((ahi == bhi) & (b0 == 1))).astype(_u32)
    return lo, hi, borrow


def _mul32(x, y):
    """32x32 -> 64 bit product as (lo32, hi32) via 16-bit halves."""
    m16 = np.uint32(0xFFFF)
    xl, xh = x & m16, x >> 16
    yl, yh = y & m16, y >> 16
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid, mid_c = _addc(lh, hl)
    lo, lo_c = _addc(ll, (mid & m16) << 16)
    hi = hh + (mid >> 16) + (mid_c << 16) + lo_c
    return lo, hi


# ---------------------------------------------------------------------------
# field ops (canonical in, canonical out)


def add(a: GF, b: GF) -> GF:
    lo, hi, c = _pair_add(a.lo, a.hi, b.lo, b.hi)
    # fold the 2^64 carry: += EPSILON (cannot re-carry for canonical inputs)
    lo2, cc = _addc(lo, c * EPS32)
    hi2 = hi + cc
    return _canonicalize(lo2, hi2)


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = _pair_sub(a.lo, a.hi, b.lo, b.hi)
    # fold the borrow: -= EPSILON (cannot re-borrow for canonical inputs)
    blo = borrow * EPS32
    lo2 = lo - blo
    hi2 = hi - (lo < blo).astype(_u32)
    return GF(lo2, hi2)


def neg(a: GF) -> GF:
    is_zero = (a.lo == 0) & (a.hi == 0)
    lo = P_LO - a.lo
    hi = P_HI - a.hi - (P_LO < a.lo).astype(_u32)
    return GF(jnp.where(is_zero, 0, lo).astype(_u32), jnp.where(is_zero, 0, hi).astype(_u32))


def _canonicalize(lo, hi):
    """One conditional subtract of p (valid for values < 2p)."""
    ge = (hi == P_HI) & (lo >= P_LO)
    return GF(
        jnp.where(ge, lo - P_LO, lo).astype(_u32),
        jnp.where(ge, hi - P_HI, hi).astype(_u32),
    )


def _reduce128(r0, r1, r2, r3):
    """(r0 + r1*2^32 + r2*2^64 + r3*2^96) mod p, canonical."""
    # t0 = lo64 - hi_hi  (hi_hi = r3)
    t0_lo = r0 - r3
    b0 = (r0 < r3).astype(_u32)
    t0_hi = r1 - b0
    underflow = ((r1 == 0) & (b0 == 1)).astype(_u32)
    #   on underflow, subtract EPSILON (never re-borrows: wrapped >= 2^32)
    sub_eps = underflow * EPS32
    t0_lo2 = t0_lo - sub_eps
    t0_hi2 = t0_hi - (t0_lo < sub_eps).astype(_u32)
    # t1 = r2 * EPSILON = (2^32 - r2, r2 - 1) for r2 != 0 else 0
    nz = (r2 != 0).astype(_u32)
    t1_lo = (jnp.zeros_like(r2) - r2).astype(_u32)
    t1_hi = r2 - nz
    # t2 = t0 + t1, fold carry with EPSILON (never re-carries)
    lo, hi, c = _pair_add(t0_lo2, t0_hi2, t1_lo, t1_hi)
    lo2, cc = _addc(lo, c * EPS32)
    hi2 = hi + cc
    return _canonicalize(lo2, hi2)


def mul(a: GF, b: GF) -> GF:
    l00, h00 = _mul32(a.lo, b.lo)
    l01, h01 = _mul32(a.lo, b.hi)
    l10, h10 = _mul32(a.hi, b.lo)
    l11, h11 = _mul32(a.hi, b.hi)
    r0 = l00
    s1, c1 = _addc(h00, l01)
    s1, c2 = _addc(s1, l10)
    r1 = s1
    carry1 = c1 + c2
    s2, d1 = _addc(h01, h10)
    s2, d2 = _addc(s2, l11)
    s2, d3 = _addc(s2, carry1)
    r2 = s2
    r3 = h11 + d1 + d2 + d3
    return _reduce128(r0, r1, r2, r3)


def sqr(a: GF) -> GF:
    """Specialized squaring: the cross partial product appears twice
    (lo*hi == hi*lo), so 3 32x32 multiplies instead of mul()'s 4 — the
    Poseidon2 S-box (x^7 = 2 sqr + 2 mul) is the prover's hottest op."""
    l00, h00 = _mul32(a.lo, a.lo)
    l01, h01 = _mul32(a.lo, a.hi)
    l11, h11 = _mul32(a.hi, a.hi)
    # double the cross product (2*l01, 2*h01) with carry into r3
    dl = l01 + l01
    dl_c = (l01 >> 31).astype(_u32) & 1
    dh = h01 + h01 + dl_c
    dh_c = (h01 >> 31).astype(_u32) & 1
    r0 = l00
    s1, c1 = _addc(h00, dl)
    r1 = s1
    s2, d1 = _addc(dh, l11)
    s2, d2 = _addc(s2, c1)
    r2 = s2
    r3 = h11 + dh_c + d1 + d2
    return _reduce128(r0, r1, r2, r3)


def mul_const(a: GF, c: int) -> GF:
    """Multiply by a Python-int constant (broadcast)."""
    return mul(a, constant(c, ()))


def add_const(a: GF, c: int) -> GF:
    return add(a, constant(c, ()))


def select(mask, a: GF, b: GF) -> GF:
    """mask ? a : b   (mask: boolean array broadcastable to a/b)."""
    return GF(
        jnp.where(mask, a.lo, b.lo).astype(_u32),
        jnp.where(mask, a.hi, b.hi).astype(_u32),
    )


def eq(a: GF, b: GF) -> jnp.ndarray:
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF) -> jnp.ndarray:
    return (a.lo == 0) & (a.hi == 0)


def pow_const(a: GF, exp: int) -> GF:
    """a ** exp for a static Python-int exponent (unrolled square-and-multiply)."""
    e = int(exp)
    if e == 0:
        return ones(a.shape)
    result = None
    acc = a
    while e > 0:
        if e & 1:
            result = acc if result is None else mul(result, acc)
        e >>= 1
        if e:
            acc = sqr(acc)
    return result


def exp7(a: GF) -> GF:
    """a^7 — the Poseidon2 S-box (3 muls: a2=a*a, a3=a2*a, a7=a3*a3*a... 4 muls).

    a2 = a^2; a4 = a2^2; a6 = a4*a2; a7 = a6*a — 4 multiplies.
    """
    a2 = sqr(a)
    a4 = sqr(a2)
    a6 = mul(a4, a2)
    return mul(a6, a)


def inv(a: GF) -> GF:
    """Fermat inverse a^(p-2); inv(0) = 0.

    Square-and-multiply as a `lax.fori_loop` over the 64 exponent bits (one
    mul + one sqr in the body) rather than an unrolled chain: the unrolled
    form put ~190 full u32-pair multiply graphs (~50k HLO ops) inline, which
    sent XLA-CPU's algebraic simplifier into pathological/circular
    simplification on the fused prover graph and made `jit(inv)` itself
    minutes-slow to compile. The loop body is traced once; runtime cost on
    TPU is unchanged (the op count is identical, just sequenced)."""
    import jax
    import jax.numpy as jnp

    e = 0xFFFFFFFF00000001 - 2
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=_u32)

    def body(i, carry):
        acc, base = carry
        take = bits[i] == 1
        acc = select(take, mul(acc, base), acc)
        return acc, sqr(base)

    acc, _ = jax.lax.fori_loop(0, int(e.bit_length()), body, (ones(a.shape), a))
    return acc


def stack(elems, axis=0) -> GF:
    return GF(
        jnp.stack([e.lo for e in elems], axis=axis),
        jnp.stack([e.hi for e in elems], axis=axis),
    )


def concat(elems, axis=0) -> GF:
    return GF(
        jnp.concatenate([e.lo for e in elems], axis=axis),
        jnp.concatenate([e.hi for e in elems], axis=axis),
    )


def _slice_axis(x, start, stop, axis):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x[tuple(idx)]


def sum_tree(a: GF, axis) -> GF:
    """Field sum along an axis via successive halving (log-depth adds, slices only)."""
    n = a.lo.shape[axis]
    cur = a
    while n > 1:
        half = n // 2
        first = GF(_slice_axis(cur.lo, 0, half, axis), _slice_axis(cur.hi, 0, half, axis))
        second = GF(
            _slice_axis(cur.lo, half, 2 * half, axis),
            _slice_axis(cur.hi, half, 2 * half, axis),
        )
        summed = add(first, second)
        if n % 2 == 1:
            last = GF(_slice_axis(cur.lo, 2 * half, n, axis), _slice_axis(cur.hi, 2 * half, n, axis))
            summed = concat([summed, last], axis=axis)
            n = half + 1
        else:
            n = half
        cur = summed
    return cur


# host-side constants for convenience
def host_roots_of_unity(n_log: int) -> np.ndarray:
    return gf_np.two_adic_subgroup(n_log)
