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
def _jitted_lde_transpose(rate_bits: int):
    import jax

    def run(coeffs: GF):
        lde = ntt.coset_lde_j(coeffs, rate_bits)
        # rows = leaves: (M, C)
        return lde, GF(lde.lo.T, lde.hi.T)

    return jax.jit(run)


@dataclass
class PolynomialBatch:
    """Committed batch: device LDE (C, M) + host Merkle tree over rows."""

    coeffs: np.ndarray  # host (C, N) u64 — coefficient forms
    lde: GF  # device (C_total, M) including salt columns
    tree: merkle.MerkleTree
    degree_bits: int
    rate_bits: int
    blinding: bool

    @property
    def num_polys(self) -> int:
        return self.coeffs.shape[0]

    @property
    def lde_size(self) -> int:
        return 1 << (self.degree_bits + self.rate_bits)

    @property
    def cap(self) -> np.ndarray:
        return self.tree.cap

    def open_rows(self, indices: list[int]) -> np.ndarray:
        """Full leaf rows (incl. salt) at the given LDE indices -> (Q, C_total)."""
        idx = np.asarray(indices, dtype=np.int64)
        lo = np.asarray(self.lde.lo[:, idx], dtype=np.uint64)
        hi = np.asarray(self.lde.hi[:, idx], dtype=np.uint64)
        return (lo | (hi << np.uint64(32))).T

    def eval_at_ext(self, z: np.ndarray) -> np.ndarray:
        """Evaluate all (non-salt) polynomials at an extension point -> (C, 2).

        Vectorised host dot: y_c = sum_i coeffs[c, i] * z^i, with the powers
        table built in O(sqrt N) sequential muls."""
        from ..field import extension as ext

        zp = ext.powers_table(z, self.coeffs.shape[1])  # (N, 2)
        terms = np.stack(
            [F.mul(self.coeffs, zp[:, 0]), F.mul(self.coeffs, zp[:, 1])], axis=-1
        )  # (C, N, 2)
        return ext.sum_axis0(np.moveaxis(terms, 1, 0))


def commit(
    coeffs: np.ndarray,
    rate_bits: int,
    cap_height: int,
    blinding: bool = False,
    salt_seed: int | None = None,
) -> PolynomialBatch:
    """Commit C polynomials given as host coefficient matrix (C, N)."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    c, n = coeffs.shape
    degree_bits = n.bit_length() - 1
    assert 1 << degree_bits == n
    lde, leaves = _jitted_lde_transpose(rate_bits)(gl.from_u64(coeffs))
    if blinding:
        rng = np.random.default_rng(salt_seed)
        salt = F.rand_felts((n << rate_bits, SALT_SIZE), rng)
        salt_g = gl.from_u64(salt)
        leaves = gl.concat([leaves, salt_g], axis=1)
        lde = gl.concat([lde, GF(salt_g.lo.T, salt_g.hi.T)], axis=0)
    tree = merkle.build_merkle_tree(leaves, cap_height)
    return PolynomialBatch(
        coeffs=coeffs,
        lde=lde,
        tree=tree,
        degree_bits=degree_bits,
        rate_bits=rate_bits,
        blinding=blinding,
    )


def verify_row(
    batch_cap: np.ndarray, row: np.ndarray, index: int, siblings: np.ndarray
) -> bool:
    """Host check: a claimed leaf row against an oracle cap."""
    digest = ps.hash_or_noop(row)
    root = merkle.merkle_root_from_proof(digest, index, siblings)
    cap_index = index >> len(siblings)
    return bool(np.array_equal(root, np.asarray(batch_cap, dtype=np.uint64)[cap_index]))
