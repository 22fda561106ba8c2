"""Poseidon2 Merkle trees with caps — batched device build, host proofs.

Commitment scheme of the prover: leaves are rows of an LDE matrix (all
polynomial evaluations at one domain point), leaf digest = hash_or_noop of the
row, internal nodes = two_to_one compressions, stopping `cap_height` levels
early so the commitment is a **cap** of `2^cap_height` digests (the
reference's `1 << cap_height` Merkle cap policy, `common/src/circuit.rs:459-468`).

TPU mapping: every tree level is one batched Poseidon2 call over all nodes on
that level (the 2-to-1 compression vectorises perfectly); the device returns
the digest levels, which are shipped to the host **once** per commitment for
cheap query-time proof extraction (28 query rounds x log N digests).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GF
from . import poseidon2 as ps


def _leaf_hash_j(leaves: GF, num_cols: int) -> GF:
    """Batched hash_or_noop over rows: leaves (L, K) -> digests (L, 4)."""
    import jax.numpy as jnp

    if num_cols <= ps.DIGEST_LEN:
        pad = [(0, 0), (0, ps.DIGEST_LEN - num_cols)]
        return GF(jnp.pad(leaves.lo, pad), jnp.pad(leaves.hi, pad))
    return ps.hash_no_pad_j(leaves, num_cols)


def build_levels_j(leaves: GF, cap_height: int):
    """Device tree build. leaves: GF (L, K). Returns list of GF digest levels,
    level 0 = leaf digests (L, 4), last = cap (2^cap_height, 4)."""
    n = leaves.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "leaf count must be a power of two"
    assert cap_height <= log_n
    digests = _leaf_hash_j(leaves, leaves.shape[1])
    levels = [digests]
    cur = digests
    while cur.shape[0] > (1 << cap_height):
        left = cur[0::2]
        right = cur[1::2]
        cur = ps.two_to_one_j(left, right)
        levels.append(cur)
    return levels


@dataclass
class MerkleTree:
    """Host-side materialised tree (digest levels as numpy (n_i, 4) u64)."""

    levels: list  # [np.ndarray (n_i, 4)] — levels[0] = leaf digests
    cap_height: int

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    def prove(self, index: int) -> np.ndarray:
        """Sibling digests from leaf level up to (but excluding) the cap."""
        siblings = []
        idx = index
        for level in self.levels[:-1]:
            siblings.append(level[idx ^ 1])
            idx >>= 1
        return np.array(siblings, dtype=np.uint64).reshape(-1, 4)


@functools.cache
def _jitted_builder(cap_height: int):
    import jax

    def run(leaves):
        levels = build_levels_j(leaves, cap_height)
        # ONE fused output: concat all digest levels so the host pays a single
        # device->host transfer (tunnel round-trips dominate at these sizes)
        return gl.concat(levels, axis=0)

    return jax.jit(run)


def _level_sizes(n: int, cap_height: int) -> list[int]:
    sizes = [n]
    while sizes[-1] > (1 << cap_height):
        sizes.append(sizes[-1] // 2)
    return sizes


def build_merkle_tree(leaves: GF, cap_height: int) -> MerkleTree:
    """Build on device (one jitted graph per shape), materialise levels on host."""
    stacked = _jitted_builder(cap_height)(leaves)
    host = gl.to_u64(stacked)
    host_levels = []
    off = 0
    for s in _level_sizes(leaves.shape[0], cap_height):
        host_levels.append(host[off : off + s])
        off += s
    return MerkleTree(levels=host_levels, cap_height=cap_height)


def merkle_root_from_proof(leaf_digest: np.ndarray, index: int, siblings: np.ndarray) -> np.ndarray:
    """Host walk: recompute the cap entry from a leaf digest and its siblings."""
    nat = ps._native()
    if nat is not None and len(siblings):
        return nat.merkle_walk(leaf_digest, index, siblings)
    cur = np.asarray(leaf_digest, dtype=np.uint64)
    idx = index
    for sib in siblings:
        if idx & 1:
            cur = ps.two_to_one(sib, cur)
        else:
            cur = ps.two_to_one(cur, sib)
        idx >>= 1
    return cur


def verify_merkle_proof(
    leaf_felts: np.ndarray, index: int, siblings: np.ndarray, cap: np.ndarray
) -> bool:
    """Host verification against a cap. leaf_felts: the raw row (K,) felts."""
    digest = ps.hash_or_noop(leaf_felts)
    root = merkle_root_from_proof(digest, index, siblings)
    cap_index = index >> len(siblings)
    return bool(np.array_equal(root, np.asarray(cap, dtype=np.uint64)[cap_index]))
