"""Tensor-parallel (by-polynomial) commitment: one oracle across the mesh.

The reference scales a single prover only by rayon threads (SURVEY §2.3); the
TPU-native axis for a circuit too big for one chip is sharding ONE
commitment's work across the mesh (SURVEY §5.8: "shard by-polynomial first,
by-coefficient when a single polynomial exceeds per-chip memory"):

  * the C column iNTT/coset-LDEs are independent -> each device transforms
    its LOCAL block of columns (zero collectives);
  * Merkle leaf hashing contracts the column axis -> ONE `all_to_all`
    re-shards the LDE from column-blocks to row-blocks (the classic
    transpose), then every device hashes its M/D rows locally;
  * with cap_height >= log2(D) the whole tree build stays local: device d
    owns the cap entries [d * 2^cap/D, (d+1) * 2^cap/D) of its own subtree —
    no cross-device 2-to-1 hashing at all. Shallower caps finish the last
    log2(D) - cap_height levels in a replicated (tiny) step.

Everything runs under `jax.shard_map` (manual partitioning — the lanes and
the transpose are explicit, and the unannotated local program skips the SPMD
partitioner on the big hash graphs). Output is bit-identical to the
single-device `fri/oracle.commit` (pinned in tests/test_sharding.py), so
`prove_staged(..., mesh=...)` yields byte-identical proofs.
"""

from __future__ import annotations

import numpy as np

from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.goldilocks import GF
from ..fri import oracle as fo
from ..fri.config import SALT_SIZE
from ..hash import merkle
from ..poly import ntt


def _commit_body(vals_local: GF, salt_local: GF, *, axis: str, n_dev: int,
                 rate_bits: int, from_values: bool, c_true: int,
                 blinding: bool, local_levels: int, gather_out: bool = False):
    """Per-device program. vals_local: (C'/D, N) local column block;
    salt_local: (M/D, SALT) local salt rows (zeros when not blinding).
    Returns (coeffs_local, lde_local, level_0_local, ..., cap_local).

    With `gather_out`, every output is re-gathered to replicated INSIDE the
    manual region (tiled `all_gather` concatenates the device blocks in axis
    order = the global natural layout) so the caller's out_specs are fully
    replicated and downstream slicing never meets a sharded dimension — the
    fused prover consumes the oracle replicated (prover_fused._commit_j_sharded)."""
    import jax.numpy as jnp
    from jax import lax

    coeffs_l = ntt.intt_j(vals_local) if from_values else vals_local
    lde_l = ntt.coset_lde_j(coeffs_l, rate_bits)  # (Cl, M)

    # transpose re-shard: column-blocks -> row-blocks over the mesh axis.
    # tiled all_to_all splits the M axis into D chunks and concatenates the
    # received column blocks, so device d ends with (C', M/D) holding the
    # global rows [d*M/D, (d+1)*M/D) of EVERY column — global row order.
    rows = GF(
        lax.all_to_all(lde_l.lo, axis, 1, 0, tiled=True),
        lax.all_to_all(lde_l.hi, axis, 1, 0, tiled=True),
    )  # (C', Ml)
    leaves = GF(rows.lo.T, rows.hi.T)  # (Ml, C')
    leaves = leaves[:, :c_true]  # drop zero-pad columns before hashing
    if blinding:
        leaves = gl.concat([leaves, salt_local], axis=1)

    digests = merkle._leaf_hash_j(leaves, leaves.shape[1])  # (Ml, 4)
    levels = [digests]
    cur = digests
    for _ in range(local_levels):
        cur = _two_to_one(cur)
        levels.append(cur)
    if gather_out:
        def gath(a: GF) -> GF:
            return GF(
                lax.all_gather(a.lo, axis, axis=0, tiled=True),
                lax.all_gather(a.hi, axis, axis=0, tiled=True),
            )

        return tuple(gath(a) for a in (coeffs_l, lde_l, *levels))
    return (coeffs_l, lde_l, *levels)


def _two_to_one(cur: GF) -> GF:
    from ..hash import poseidon2 as ps

    return ps.two_to_one_j(cur[0::2], cur[1::2])


def commit_sharded(
    values,
    mesh,
    rate_bits: int,
    cap_height: int,
    axis: str = "cols",
    blinding: bool = False,
    salt_seed: int | None = None,
    from_values: bool = False,
    stats: dict | None = None,
) -> fo.PolynomialBatch:
    """Mesh-sharded equivalent of `fri/oracle.commit` — same inputs, same
    PolynomialBatch out, proof-byte-identical transcripts."""
    import jax
    from jax.sharding import PartitionSpec as P

    gvals = values if isinstance(values, GF) else gl.from_u64(
        np.asarray(values, dtype=np.uint64)
    )
    c, n = gvals.shape
    degree_bits = n.bit_length() - 1
    assert 1 << degree_bits == n
    m = n << rate_bits
    n_dev = mesh.shape[axis]
    assert m % n_dev == 0 and (m // n_dev) % n_dev == 0, (
        "need D | M/D for the commit transpose"
    )
    ml = m // n_dev

    # pad the column count to a multiple of the mesh axis (zero polynomials;
    # they are sliced off before leaf hashing and after the shard_map)
    c_pad = -(-c // n_dev) * n_dev
    if c_pad != c:
        pad = gl.zeros((c_pad - c, n))
        gvals = gl.concat([gvals, pad], axis=0)

    # identical salt stream to the single-device commit (bit-identity)
    if blinding:
        rng = np.random.default_rng(salt_seed)
        salt = gl.from_u64(F.rand_felts((m, SALT_SIZE), rng))
    else:
        salt = gl.zeros((m, SALT_SIZE))

    # local tree depth: stop at the cap when it is deeper than the shard
    # boundary, else at one digest per device and finish replicated below
    local_levels = (m // n_dev).bit_length() - 1 - max(
        cap_height - (n_dev.bit_length() - 1), 0
    )
    local_levels = min(local_levels, degree_bits + rate_bits - cap_height)

    import functools

    body = functools.partial(
        _commit_body,
        axis=axis,
        n_dev=n_dev,
        rate_bits=rate_bits,
        from_values=from_values,
        c_true=c,
        blinding=blinding,
        local_levels=local_levels,
    )
    key = ("tp_commit", gvals.shape, rate_bits, cap_height, blinding,
           from_values, n_dev, axis)
    cache = _JIT_CACHE.get(key)
    if cache is None:
        cache = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis, None)),
                out_specs=(P(axis, None), P(axis, None))
                + tuple(P(axis, None) for _ in range(local_levels + 1)),
                check_vma=False,
            )
        )
        _JIT_CACHE[key] = cache
    import time

    t0 = time.perf_counter()
    with jax.set_mesh(mesh):
        out = cache(gvals, salt)
    coeffs_p, lde_p, *levels_dev = out
    if stats is not None:
        # collective census of the compiled per-device program: the design
        # claim is ONE all_to_all transpose (x2 for the u32 lo/hi planes)
        # and no other cross-device traffic in the commit hot path
        # count instruction call sites (`opcode(`), not the get-tuple-element
        # references to their results
        txt = cache.lower(gvals, salt).compile().as_text()
        stats["all_to_all"] = txt.count("all-to-all(")
        stats["other_collectives"] = sum(
            txt.count(s) for s in ("all-reduce(", "all-gather(", "collective-permute(")
        )
        stats["n_devices"] = n_dev
        stats["wall_s"] = round(time.perf_counter() - t0, 4)

    # v1 scope: the commit COMPUTE (column NTTs + transpose + batched hashing
    # + subtree builds — the hot work) is sharded; the resulting oracle is
    # re-gathered to replicated storage because the downstream stages
    # (quotient, openings, FRI composition) still consume whole arrays.
    # Keeping the oracle sharded end-to-end is the sharded-quotient follow-up.
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())

    def gather(a: GF) -> GF:
        return GF(jax.device_put(a.lo, repl), jax.device_put(a.hi, repl))

    coeffs = gather(coeffs_p)[:c]
    lde = gather(lde_p)[:c]
    if blinding:
        lde = gl.concat([lde, GF(salt.lo.T, salt.hi.T)], axis=0)

    # materialise host levels; finish any remaining top levels (tiny: at most
    # D digests) on the host oracle
    host_levels = [gl.to_u64(lv) for lv in levels_dev]
    from ..hash import poseidon2 as ps

    cur = host_levels[-1]
    while cur.shape[0] > (1 << cap_height):
        cur = np.stack(
            [ps.two_to_one(cur[i], cur[i + 1]) for i in range(0, cur.shape[0], 2)]
        )
        host_levels.append(cur)
    tree = merkle.MerkleTree(levels=host_levels, cap_height=cap_height)

    return fo.PolynomialBatch(
        coeffs_dev=coeffs,
        lde=lde,
        tree=tree,
        degree_bits=degree_bits,
        rate_bits=rate_bits,
        blinding=blinding,
        num_polys=c,
    )


_JIT_CACHE: dict = {}
