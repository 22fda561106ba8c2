"""Comparison + sorting circuit gadgets over Goldilocks.

Port of reference `common/src/gadgets.rs` onto our CircuitBuilder: constant
comparisons (width <= 63 via bit-split; width 64 via the canonical 32-bit
half-split that kills the `x + p` wraparound alias), u32 comparison, digest
equality, PI-offset helpers, and the `sort_digests4` odd-even transposition
network with ingress-hoisted canonical splits (~3x gate saving vs re-splitting
inside every comparator — reference `gadgets.rs:443-452` pins gate budgets).
"""

from __future__ import annotations

from ..plonk.builder import CircuitBuilder

P = 0xFFFFFFFF00000001
MASK32 = 0xFFFFFFFF


def _assert_comparison_width(left: int, n_log: int) -> None:
    assert n_log > 0, "comparison bit width must be greater than zero"
    assert n_log <= 64, f"comparison bit width {n_log} exceeds 64 bits"
    assert left < (1 << n_log), f"left constant {left} does not fit in {n_log} bits"


def xor(b: CircuitBuilder, a: int, c: int) -> int:
    """Boolean XOR: a + c - 2ac."""
    ac = b.mul(a, c)
    two_ac = b.mul_const(2, ac)
    return b.sub(b.add(a, c), two_ac)


def is_const_less_than(b: CircuitBuilder, left: int, right: int, n_log: int) -> int:
    """Bool target for `left < right`; range-constrains right to n_log bits.

    Width 64 routes through the canonical half-split so the Goldilocks
    wraparound alias cannot flip the comparison."""
    _assert_comparison_width(left, n_log)
    if n_log == 64:
        return _is_const_less_than_canonical_u64(b, left, right)
    right_bits = b.split_le(right, n_log)
    lt = b._false()
    eq = b._true()
    for i in reversed(range(n_log)):
        a_bit = b.constant_bool((left >> i) & 1 == 1)
        r_bit = right_bits[i]
        not_a = b.not_(a_bit)
        this_lt = b.and_(b.and_(not_a, r_bit), eq)
        lt = b.or_(lt, this_lt)
        eq = b.and_(eq, b.not_(xor(b, a_bit, r_bit)))
    return lt


def _is_const_less_than_canonical_u64(b: CircuitBuilder, left: int, right: int) -> int:
    lo, hi = split_canonical_u32_halves(b, right)
    left_lo = b.constant(left & MASK32)
    left_hi = b.constant(left >> 32)
    hi_lt = u32_lt(b, left_hi, hi)
    lo_lt = u32_lt(b, left_lo, lo)
    hi_eq = b.is_equal(left_hi, hi)
    return b.or_(hi_lt, b.and_(hi_eq, lo_lt))


def enforce_target_less_than_const(
    b: CircuitBuilder, target: int, upper_bound_exclusive: int, n_log: int
) -> None:
    assert upper_bound_exclusive > 0
    _assert_comparison_width(upper_bound_exclusive - 1, n_log)
    overflow = is_const_less_than(b, upper_bound_exclusive - 1, target, n_log)
    b.assert_zero(overflow)


def bytes_digest_eq(b: CircuitBuilder, a: list[int], c: list[int]) -> int:
    """Limb-wise equality of two 4-felt digests -> bool target."""
    es = [b.is_equal(a[i], c[i]) for i in range(4)]
    return b.and_(b.and_(es[0], es[1]), b.and_(es[2], es[3]))


def limbs4_at_offset(pis: list[int], index: int, leaf_pi_len: int, key_offset: int) -> list[int]:
    base = index * leaf_pi_len + key_offset
    return list(pis[base : base + 4])


def limb1_at_offset(pis: list[int], index: int, leaf_pi_len: int, key_offset: int) -> int:
    return pis[index * leaf_pi_len + key_offset]


def u32_lt(b: CircuitBuilder, x: int, y: int) -> int:
    """x < y for 32-bit-constrained inputs: bit 32 of x + 2^32 - y is x >= y."""
    t = b.sub(b.add_const(x, 1 << 32), y)
    _low, ge_bit = b.split_low_high(t, 32, 33)
    return b.not_(ge_bit)


def split_canonical_u32_halves(b: CircuitBuilder, x: int) -> tuple[int, int]:
    """(lo, hi) with x = lo + hi*2^32, excluding the wraparound region
    hi == 2^32-1 && lo >= 1 so the decomposition is unique (canonical)."""
    lo, hi = b.split_low_high(x, 32, 64)
    hi_is_max = b.is_equal(hi, b.constant(MASK32))
    lo_nonzero = b.not_(b.is_equal(lo, b.zero()))
    b.assert_zero(b.and_(hi_is_max, lo_nonzero))
    return lo, hi


def halves8_lt(b: CircuitBuilder, lhs: list[int], rhs: list[int]) -> int:
    """Lexicographic < over 8 range-checked 32-bit halves, most significant first."""
    lt = b._false()
    for i in reversed(range(8)):
        lt_i = u32_lt(b, lhs[i], rhs[i])
        eq_i = b.is_equal(lhs[i], rhs[i])
        lt = b.or_(lt_i, b.and_(eq_i, lt))
    return lt


def sort_digests4(b: CircuitBuilder, values: list[list[int]]) -> list[list[int]]:
    """Sort 4-limb digests ascending (limb 0 most significant, canonical-u64
    limb order) via odd-even transposition; output is provably a permutation
    of the input for ANY witness, and the order is sound against malicious
    provers (ingress canonical splits)."""
    n = len(values)
    if n <= 1:
        return list(values)
    v: list[list[int]] = []
    for d in values:
        halves = [None] * 8
        for j in range(4):
            lo, hi = split_canonical_u32_halves(b, d[j])
            halves[2 * j] = hi
            halves[2 * j + 1] = lo
        v.append(halves)
    for rnd in range(n):
        i = rnd % 2
        while i + 1 < n:
            lhs, rhs = v[i], v[i + 1]
            lhs_lt = halves8_lt(b, lhs, rhs)
            v[i] = [b.select(lhs_lt, lhs[j], rhs[j]) for j in range(8)]
            v[i + 1] = [b.select(lhs_lt, rhs[j], lhs[j]) for j in range(8)]
            i += 2
    # egress: recombine halves into limbs (hi * 2^32 + lo)
    out = []
    for halves in v:
        limbs = []
        for j in range(4):
            limbs.append(b.mul_const_add(1 << 32, halves[2 * j], halves[2 * j + 1]))
        out.append(limbs)
    return out
