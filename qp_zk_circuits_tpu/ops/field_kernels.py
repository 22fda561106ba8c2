"""Pallas kernels for Goldilocks lane arithmetic.

`mul_kernel` fuses the entire 64x64->128 limb product + folding reduction
into one VMEM pass (the jnp path materialises ~15 intermediate arrays in HBM
between fused ops; a single kernel keeps them in registers/VMEM). Grid tiles
rows by TILE_R so arbitrary batch sizes stream through.

All kernels are bit-exact against `field/goldilocks.py` (tested in
interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.goldilocks import GF

EPS32 = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
M16 = np.uint32(0xFFFF)


def _mul_block(alo, ahi, blo, bhi):
    """The same limb algebra as field/goldilocks.py, on block values."""

    def addc(x, y):
        s = x + y
        return s, (s < x).astype(jnp.uint32)

    def mul32(x, y):
        xl, xh = x & M16, x >> 16
        yl, yh = y & M16, y >> 16
        ll = xl * yl
        lh = xl * yh
        hl = xh * yl
        hh = xh * yh
        mid, mid_c = addc(lh, hl)
        lo, lo_c = addc(ll, (mid & M16) << 16)
        hi = hh + (mid >> 16) + (mid_c << 16) + lo_c
        return lo, hi

    l00, h00 = mul32(alo, blo)
    l01, h01 = mul32(alo, bhi)
    l10, h10 = mul32(ahi, blo)
    l11, h11 = mul32(ahi, bhi)
    r0 = l00
    s1, c1 = addc(h00, l01)
    s1, c2 = addc(s1, l10)
    r1 = s1
    carry1 = c1 + c2
    s2, d1 = addc(h01, h10)
    s2, d2 = addc(s2, l11)
    s2, d3 = addc(s2, carry1)
    r2 = s2
    r3 = h11 + d1 + d2 + d3
    # reduce 128 -> canonical 64
    t0_lo = r0 - r3
    b0 = (r0 < r3).astype(jnp.uint32)
    t0_hi = r1 - b0
    under = ((r1 == 0) & (b0 == 1)).astype(jnp.uint32)
    sub_eps = under * EPS32
    t0_lo2 = t0_lo - sub_eps
    t0_hi2 = t0_hi - (t0_lo < sub_eps).astype(jnp.uint32)
    nz = (r2 != 0).astype(jnp.uint32)
    t1_lo = (jnp.zeros_like(r2) - r2).astype(jnp.uint32)
    t1_hi = r2 - nz
    lo, c = addc(t0_lo2, t1_lo)
    hi1, c1b = addc(t0_hi2, t1_hi)
    hi2, c2b = addc(hi1, c)
    lo2, cc = addc(lo, (c1b + c2b) * EPS32)
    hi3 = hi2 + cc
    ge = (hi3 == P_HI) & (lo2 >= P_LO)
    return (
        jnp.where(ge, lo2 - P_LO, lo2).astype(jnp.uint32),
        jnp.where(ge, hi3 - P_HI, hi3).astype(jnp.uint32),
    )


def _mul_kernel(alo_ref, ahi_ref, blo_ref, bhi_ref, olo_ref, ohi_ref):
    lo, hi = _mul_block(alo_ref[:], ahi_ref[:], blo_ref[:], bhi_ref[:])
    olo_ref[:] = lo
    ohi_ref[:] = hi


TILE_R = 256
LANES = 128


@functools.cache
def _mul_call(rows: int, interpret: bool):
    grid = (pl.cdiv(rows, TILE_R),)
    spec = pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        interpret=interpret,
    )


def mul_pallas(a: GF, b: GF, interpret: bool = False) -> GF:
    """Fused canonical Goldilocks multiply. Flattens to (rows, 128) lanes."""
    shape = a.lo.shape
    n = int(np.prod(shape))
    rows = pl.cdiv(max(n, 1), LANES)
    rows = ((rows + TILE_R - 1) // TILE_R) * TILE_R  # pad to the tile grid
    pad = rows * LANES - n

    def prep(x):
        return jnp.pad(x.reshape(-1), (0, pad)).reshape(rows, LANES)

    olo, ohi = _mul_call(rows, interpret)(
        prep(a.lo), prep(a.hi), prep(b.lo), prep(b.hi)
    )
    return GF(
        olo.reshape(-1)[:n].reshape(shape), ohi.reshape(-1)[:n].reshape(shape)
    )
