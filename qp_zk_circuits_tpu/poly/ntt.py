"""Batched radix-2 NTT / iNTT / coset-LDE over Goldilocks, for TPU.

This is the prover's hottest kernel family (reference hot loop: "trace LDE
(NTT, 2^(13..15+3) points/poly)" — SURVEY §3.1 / `qp-plonky2` prove pipeline).

Design (TPU-first):
  * Polynomials are processed as a **batch**: shape (C, N) with C independent
    columns (wires, sigmas, quotient chunks) sharing one set of twiddles —
    the classic by-polynomial decomposition of SURVEY §2.3.
  * Iterative Cooley-Tukey, decimation-in-time, natural-order in/out with one
    up-front bit-reversal gather. Each of the log2(N) stages is ~3 field ops
    over the whole (C, N) block — pure VPU work with unit-stride slices, so
    XLA fuses each stage into a couple of elementwise kernels.
  * Evaluations are kept in **natural order** (f(w^i) at index i); FRI folding
    uses the (i, i + N/2) pairing, which stays natural-order after each fold.
  * Twiddle tables are tiny (sum over stages = N-1 felts) and baked as
    constants into the jitted graph.

Host mirrors (`ntt_np`, `intt_np`, `coset_lde_np`) are the test oracle and
serve small host-side needs (e.g. verifier-side final-poly checks).
"""

from __future__ import annotations

import functools

import numpy as np

from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.goldilocks import GF


# ---------------------------------------------------------------------------
# host tables


@functools.cache
def bit_reversal_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.cache
def stage_twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Twiddles per stage s = 1..log_n: w_{2^s}^j for j < 2^(s-1)."""
    out = []
    for s in range(1, log_n + 1):
        w = F.primitive_root_of_unity(s)
        if inverse:
            w = F.inv(w)
        out.append(F.powers(w, 1 << (s - 1)))
    return tuple(out)


# ---------------------------------------------------------------------------
# host (numpy) NTT — same algorithm as the device path


def ntt_np(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """In-order radix-2 NTT along the last axis. values: (..., N) uint64."""
    values = np.asarray(values, dtype=np.uint64)
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    x = values[..., bit_reversal_perm(log_n)]
    tw = stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << (s - 1)
        shape = x.shape[:-1] + (n >> s, 2, m)
        xs = x.reshape(shape)
        even = xs[..., 0, :]
        odd = F.mul(xs[..., 1, :], tw[s - 1])
        x = np.concatenate([F.add(even, odd)[..., None, :], F.sub(even, odd)[..., None, :]], axis=-2)
        x = x.reshape(values.shape)
    if inverse:
        n_inv = F.inv(np.uint64(n))
        x = F.mul(x, n_inv)
    return x


def intt_np(values: np.ndarray) -> np.ndarray:
    return ntt_np(values, inverse=True)


def coset_lde_np(coeffs: np.ndarray, rate_bits: int, shift=None) -> np.ndarray:
    """Evaluate coeffs (..., N) over the coset shift * H' with |H'| = N << rate_bits."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    n = coeffs.shape[-1]
    big_n = n << rate_bits
    if shift is None:
        shift = F.MULTIPLICATIVE_GROUP_GENERATOR
    padded = np.zeros(coeffs.shape[:-1] + (big_n,), dtype=np.uint64)
    padded[..., :n] = F.mul(coeffs, F.powers(shift, n))
    return ntt_np(padded)


def eval_poly_np(coeffs: np.ndarray, x) -> np.ndarray:
    """Horner evaluation of (..., N) coeffs at base-field scalar x."""
    acc = np.zeros(coeffs.shape[:-1], dtype=np.uint64)
    for i in range(coeffs.shape[-1] - 1, -1, -1):
        acc = F.add(F.mul(acc, np.uint64(x)), coeffs[..., i])
    return acc


# ---------------------------------------------------------------------------
# device (JAX) NTT


def _stage_j(x: GF, tw: GF, s: int, n: int, batch_shape) -> GF:
    m = 1 << (s - 1)
    shape = batch_shape + (n >> s, 2, m)
    xs = x.reshape(shape)
    even = xs[..., 0, :]
    odd = gl.mul(xs[..., 1, :], _bcast(tw, xs.lo[..., 1, :].shape))
    hi = gl.sub(even, odd)
    lo = gl.add(even, odd)
    out = gl.stack([lo, hi], axis=-2)
    return out.reshape(batch_shape + (n,))


def _bcast(a: GF, shape) -> GF:
    import jax.numpy as jnp

    return GF(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))


def ntt_j(values: GF, inverse: bool = False) -> GF:
    """In-order radix-2 NTT along the last axis of a GF array (..., N)."""
    import jax.numpy as jnp

    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    batch_shape = values.shape[:-1]
    perm = jnp.asarray(bit_reversal_perm(log_n))
    x = GF(values.lo[..., perm], values.hi[..., perm])
    tws = stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        x = _stage_j(x, gl.from_u64(tws[s - 1]), s, n, batch_shape)
    if inverse:
        n_inv = int(F.inv(np.uint64(n)))
        x = gl.mul_const(x, n_inv)
    return x


def intt_j(values: GF) -> GF:
    return ntt_j(values, inverse=True)


def coset_lde_j(coeffs: GF, rate_bits: int, shift: int | None = None) -> GF:
    """coeffs (..., N) -> evaluations over shift*H', |H'| = N << rate_bits."""
    import jax.numpy as jnp

    n = coeffs.shape[-1]
    big_n = n << rate_bits
    if shift is None:
        shift = int(F.MULTIPLICATIVE_GROUP_GENERATOR)
    shift_pows = gl.from_u64(F.powers(np.uint64(shift), n))
    scaled = gl.mul(coeffs, _bcast(shift_pows, coeffs.lo.shape))
    pad = [(0, 0)] * (coeffs.lo.ndim - 1) + [(0, big_n - n)]
    padded = GF(jnp.pad(scaled.lo, pad), jnp.pad(scaled.hi, pad))
    return ntt_j(padded)
