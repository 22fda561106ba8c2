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


# ---------------------------------------------------------------------------
# by-coefficient SHARDED NTT (one polynomial too large for a chip)
#
# Four-step (transpose) decomposition N = D * L over D devices, with the
# coefficient axis sharded in contiguous blocks of L = N/D:
#
#   X[L*k1 + k2] = sum_{n1<D} w_D^{n1*k1} * w_N^{n1*k2}
#                    * [ sum_{n2<L} w_L^{n2*k2} * x[D*n2 + n1] ]
#
# Per device: block->cyclic all-to-all, local length-L NTT, twiddle by the
# device's w_N^{p*k2} row, transpose all-to-all, local length-D NTT across the
# received slab, and a final all-to-all back to contiguous blocks. This is
# the "butterfly all-to-all over ICI" shape of SURVEY §2.3/§5.8 — all
# communication is jax.lax.all_to_all, which XLA lowers to ICI collectives.


def sharded_twiddles(n: int, n_dev: int, inverse: bool) -> np.ndarray:
    """(D, L) table T[p, k2] = w_N^{±p*k2} — passed sharded by rows so each
    device reads exactly its own twiddle row."""
    w = F.primitive_root_of_unity(n.bit_length() - 1)
    if inverse:
        w = F.inv(w)
    l = n // n_dev
    rows = [F.powers(F.pow_scalar(w, p), l) for p in range(n_dev)]
    return np.stack(rows)


def _ntt_shard_body(x: GF, tw_row: GF, axis: str, n_dev: int, inverse: bool) -> GF:
    """Per-device body (runs under shard_map). x: (L,) local block."""
    import jax
    from jax import lax

    l = x.shape[-1]
    ld = l // n_dev

    def a2a(arr: GF, split_axis: int, concat_axis: int) -> GF:
        return GF(
            lax.all_to_all(arr.lo, axis, split_axis, concat_axis, tiled=True),
            lax.all_to_all(arr.hi, axis, split_axis, concat_axis, tiled=True),
        )

    # block -> cyclic: x_local[q*D + r] belongs to residue-class device r
    xr = x.reshape((ld, n_dev))
    xr = GF(xr.lo.T, xr.hi.T)  # (D, L/D), axis 0 = destination residue
    xc = a2a(xr, 0, 0).reshape((l,))  # now holds x[D*n2 + p] over n2

    # local length-L NTT over n2, then the device's w_N^{p*k2} twiddle row
    y = ntt_j(xc, inverse=inverse)
    y = gl.mul(y, tw_row)

    # transpose: k2-slabs out, n1-rows in
    ys = y.reshape((n_dev, ld))  # axis 0 = k2 slab = destination
    z = a2a(ys, 0, 0)  # (D, L/D): [n1, t] for my k2 = p*(L/D)+t
    z = GF(z.lo.T, z.hi.T)  # (L/D, D)
    z = ntt_j(z, inverse=inverse)  # local length-D NTT over n1 -> [t, k1]

    # k1 indexes the owner of the contiguous output block
    out = a2a(z, 1, 1)  # (L/D, D): [t, p_src]
    out = GF(out.lo.T, out.hi.T)  # (D, L/D): k2 = p_src*(L/D) + t
    return out.reshape((l,))


def ntt_sharded(values: GF, mesh, axis: str = "cols", inverse: bool = False) -> GF:
    """Radix-2 NTT of ONE polynomial sharded by coefficient over `mesh[axis]`.

    values: GF (N,) laid out in contiguous blocks of N/D per device. Returns
    natural-order evaluations with the same block layout. Bit-identical to
    `ntt_j` (pinned in tests/test_sharding.py). Requires D | N/D."""
    import functools

    import jax
    from jax.sharding import PartitionSpec as P

    n = values.shape[-1]
    n_dev = mesh.shape[axis]
    assert (n // n_dev) % n_dev == 0, "need D | N/D for the transpose algorithm"
    tw = gl.from_u64(sharded_twiddles(n, n_dev, inverse))

    body = functools.partial(
        _ntt_shard_body, axis=axis, n_dev=n_dev, inverse=inverse
    )
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis, None)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    # NOTE: no extra 1/N here — the inverse sub-NTTs already scale by
    # 1/L and 1/D, which compose to exactly 1/N.
    with jax.set_mesh(mesh):
        return fn(values, tw)
