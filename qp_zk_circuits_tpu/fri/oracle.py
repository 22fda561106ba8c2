"""Polynomial batch commitments: coset LDE + salted Merkle cap ("oracles").

The prover's committed objects (wires, Zs/partial products, quotient chunks,
constants/sigmas) are each a `PolynomialBatch`: C polynomials of degree < N,
evaluated over the coset g*H' with blowup 2^rate_bits, rows Merkle-committed
with a cap (the `lde_size = 2^(degree_bits + rate_bits)` object of reference
`common/src/circuit.rs:451-457`).

TPU path: the LDE is one batched NTT over all columns; the tree build is one
batched Poseidon2 per level. Blinding appends SALT_SIZE random felt columns
to every leaf row (the fork's RowBlinding-class zero-knowledge hides witness
rows at commitment granularity — `common/src/circuit.rs:389-395`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.goldilocks import GF
from ..hash import merkle
from ..hash import poseidon2 as ps
from ..poly import ntt
from .config import SALT_SIZE


@functools.cache
def _jitted_lde_transpose(rate_bits: int, from_values: bool):
    import jax

    def run(coeffs: GF):
        if from_values:
            coeffs = ntt.intt_j(coeffs)
        lde = ntt.coset_lde_j(coeffs, rate_bits)
        # rows = leaves: (M, C)
        return coeffs, lde, GF(lde.lo.T, lde.hi.T)

    return jax.jit(run)


@functools.cache
def _jitted_eval_at_ext(shape):
    import jax
    import jax.numpy as jnp

    from ..field.extension import GF2

    def run(coeffs: GF, zp: GF2):
        # y_c = sum_i coeffs[c, i] * z^i — two base-field weighted reductions
        def part(comp):
            t = gl.mul(
                coeffs,
                GF(
                    jnp.broadcast_to(comp.lo, coeffs.lo.shape),
                    jnp.broadcast_to(comp.hi, coeffs.lo.shape),
                ),
            )
            y = gl.sum_tree(t, axis=1)
            return GF(y.lo[:, 0], y.hi[:, 0])

        y0, y1 = part(zp.c0), part(zp.c1)
        return GF(
            jnp.stack([y0.lo, y1.lo], axis=-1), jnp.stack([y0.hi, y1.hi], axis=-1)
        )

    return jax.jit(run)


@dataclass
class PolynomialBatch:
    """Committed batch: device coefficients + LDE (C, M) + host Merkle tree."""

    coeffs_dev: GF  # device (C, N) coefficient forms (no salt)
    lde: GF  # device (C_total, M) including salt columns
    tree: merkle.MerkleTree
    degree_bits: int
    rate_bits: int
    blinding: bool
    num_polys: int

    @property
    def lde_size(self) -> int:
        return 1 << (self.degree_bits + self.rate_bits)

    @property
    def cap(self) -> np.ndarray:
        return self.tree.cap

    @property
    def coeffs(self) -> np.ndarray:
        """Host copy of the coefficient matrix (cold path)."""
        return gl.to_u64(self.coeffs_dev)

    def open_rows(self, indices: list[int]) -> np.ndarray:
        """Full leaf rows (incl. salt) at the given LDE indices -> (Q, C_total).

        One fused device gather + ONE host transfer."""
        import jax.numpy as jnp

        idx = np.asarray(indices, dtype=np.int64)
        packed = jnp.stack([self.lde.lo[:, idx], self.lde.hi[:, idx]])
        both = np.asarray(packed, dtype=np.uint64)
        return (both[0] | (both[1] << np.uint64(32))).T

    def eval_at_ext(self, z: np.ndarray) -> np.ndarray:
        """Evaluate all (non-salt) polynomials at an extension point -> (C, 2)."""
        from ..field import extension as ext

        n = self.coeffs_dev.shape[1]
        zp = ext.powers_table(np.asarray(z, dtype=np.uint64), n)  # host (N, 2)
        out = _jitted_eval_at_ext(self.coeffs_dev.shape)(
            self.coeffs_dev, ext.GF2(gl.from_u64(zp[:, 0]), gl.from_u64(zp[:, 1]))
        )
        return gl.to_u64(out)


def commit(
    values,
    rate_bits: int,
    cap_height: int,
    blinding: bool = False,
    salt_seed: int | None = None,
    from_values: bool = False,
) -> PolynomialBatch:
    """Commit C polynomials. `values`: host (C, N) array or device GF; with
    `from_values=True` the rows are evaluations over H (iNTT runs on device)."""
    if isinstance(values, GF):
        gvals = values
    else:
        gvals = gl.from_u64(np.asarray(values, dtype=np.uint64))
    c, n = gvals.shape
    degree_bits = n.bit_length() - 1
    assert 1 << degree_bits == n
    coeffs, lde, leaves = _jitted_lde_transpose(rate_bits, from_values)(gvals)
    if blinding:
        rng = np.random.default_rng(salt_seed)
        salt = F.rand_felts((n << rate_bits, SALT_SIZE), rng)
        salt_g = gl.from_u64(salt)
        leaves = gl.concat([leaves, salt_g], axis=1)
        lde = gl.concat([lde, GF(salt_g.lo.T, salt_g.hi.T)], axis=0)
    tree = merkle.build_merkle_tree(leaves, cap_height)
    return PolynomialBatch(
        coeffs_dev=coeffs,
        lde=lde,
        tree=tree,
        degree_bits=degree_bits,
        rate_bits=rate_bits,
        blinding=blinding,
        num_polys=c,
    )


@functools.cache
def _jitted_eval_many(shapes: tuple, next_oracle: int, next_count: int):
    import jax
    import jax.numpy as jnp

    from ..field.extension import GF2

    def one(coeffs: GF, zp: GF2) -> GF:
        def part(comp):
            t = gl.mul(
                coeffs,
                GF(
                    jnp.broadcast_to(comp.lo, coeffs.lo.shape),
                    jnp.broadcast_to(comp.hi, coeffs.lo.shape),
                ),
            )
            y = gl.sum_tree(t, axis=1)
            return GF(y.lo[:, 0], y.hi[:, 0])

        y0, y1 = part(zp.c0), part(zp.c1)
        return GF(jnp.stack([y0.lo, y1.lo], -1), jnp.stack([y0.hi, y1.hi], -1))

    def run(coeffs_list, zp, zp_next):
        outs = [one(c, zp) for c in coeffs_list]
        nxt = one(coeffs_list[next_oracle][:next_count], zp_next)
        return gl.concat(outs + [nxt], axis=0)

    return jax.jit(run)


def eval_openings(oracles, zeta, zeta_next, next_oracle: int = 2, next_count: int = 0):
    """Evaluate ALL oracles at zeta (+ `next_count` cols of one oracle at
    zeta_next) in ONE device call / ONE transfer. Returns (per-oracle (C,2)
    arrays, next (next_count,2))."""
    from ..field import extension as ext

    n = oracles[0].coeffs_dev.shape[1]
    zp = ext.powers_table(np.asarray(zeta, dtype=np.uint64), n)
    zpn = ext.powers_table(np.asarray(zeta_next, dtype=np.uint64), n)
    shapes = tuple(o.coeffs_dev.shape for o in oracles)
    out = _jitted_eval_many(shapes, next_oracle, next_count)(
        [o.coeffs_dev for o in oracles],
        ext.GF2(gl.from_u64(zp[:, 0]), gl.from_u64(zp[:, 1])),
        ext.GF2(gl.from_u64(zpn[:, 0]), gl.from_u64(zpn[:, 1])),
    )
    host = gl.to_u64(out)
    parts, off = [], 0
    for c, _ in shapes:
        parts.append(host[off : off + c])
        off += c
    return parts, host[off : off + next_count]


@functools.cache
def _jitted_open_rows(shapes: tuple, q: int):
    import jax
    import jax.numpy as jnp

    def run(ldes, idx):
        los = [l.lo[:, idx] for l in ldes]
        his = [l.hi[:, idx] for l in ldes]
        return jnp.stack(
            [jnp.concatenate(los, axis=0), jnp.concatenate(his, axis=0)]
        )

    return jax.jit(run)


def open_rows_many(oracles, indices) -> list[np.ndarray]:
    """Leaf rows of ALL oracles at the query indices — one call, one transfer.
    Returns per-oracle (Q, C_total) host arrays."""
    idx = np.asarray(indices, dtype=np.int64)
    shapes = tuple(o.lde.shape for o in oracles)
    packed = np.asarray(
        _jitted_open_rows(shapes, len(idx))([o.lde for o in oracles], idx),
        dtype=np.uint64,
    )
    full = (packed[0] | (packed[1] << np.uint64(32))).T  # (Q, sum C)
    out, off = [], 0
    for c, _ in shapes:
        out.append(full[:, off : off + c])
        off += c
    return out


def verify_row(
    batch_cap: np.ndarray, row: np.ndarray, index: int, siblings: np.ndarray
) -> bool:
    """Host check: a claimed leaf row against an oracle cap."""
    digest = ps.hash_or_noop(row)
    root = merkle.merkle_root_from_proof(digest, index, siblings)
    cap_index = index >> len(siblings)
    return bool(np.array_equal(root, np.asarray(batch_cap, dtype=np.uint64)[cap_index]))
