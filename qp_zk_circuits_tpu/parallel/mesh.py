"""Device meshes and sharded prover steps.

The reference has NO distributed backend (single-process rayon — SURVEY
§2.3); the TPU-native scaling axes are:

  * **dp** ("proofs"): a batch of independent leaf proofs sharded across
    chips — the reference's embarrassingly-parallel batch proving, now one
    SPMD program;
  * **tp** ("cols"): one large trace's polynomial columns sharded across
    chips — column NTTs are independent (by-polynomial decomposition), and
    Merkle leaf hashing re-gathers rows with an XLA all-gather over ICI;
  * pipeline parallelism maps to the aggregation tree itself (leaf ->
    private batch -> public batch), orchestrated at the service layer.

Everything here is jit + NamedSharding: XLA inserts the ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gl
from ..field.goldilocks import GF
from ..hash import poseidon2 as ps
from ..poly import ntt


def make_prover_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """Mesh with axes ("proofs", "cols")."""
    devs = jax.devices()
    n = n_devices or len(devs)
    dp = dp or n
    tp = n // dp
    assert dp * tp == n, "mesh axes must tile the device count"
    return jax.make_mesh((dp, tp), ("proofs", "cols"), devices=devs[:n])


def batch_commit_step(traces: GF, rate_bits: int, cap_height: int):
    """The sharded flagship step: for a BATCH of wire traces (B, C, N),
    interpolate, coset-LDE, hash leaf rows and build Merkle caps.

    Batched over proofs (dp) and polynomial columns (tp): the iNTT/LDE are
    independent per (proof, column); leaf hashing contracts the column axis,
    so XLA all-gathers columns over the "cols" axis before the row hashes.
    Returns (caps (B, 2^cap, 4), ldes (B, C, M))."""
    coeffs = ntt.intt_j(traces)
    lde = ntt.coset_lde_j(coeffs, rate_bits)  # (B, C, M)
    leaves = GF(
        lde.lo.transpose(0, 2, 1), lde.hi.transpose(0, 2, 1)
    )  # (B, M, C)
    digests = ps.hash_no_pad_j(leaves, leaves.shape[-1])  # (B, M, 4)
    cur = digests
    while cur.shape[1] > (1 << cap_height):
        cur = ps.two_to_one_j(cur[:, 0::2], cur[:, 1::2])
    return cur, lde


def sharded_prove_batch(data, mesh: Mesh, pws: list, seed: int | None = None) -> list:
    """The REAL prover, data-parallel over the mesh's "proofs" axis.

    This runs `prover_fused`'s complete post-witness pipeline (trace LDE,
    Poseidon2 Merkle commits, permutation argument, quotient, FRI
    commit/fold, PoW grind, query gathers) under `jax.shard_map`: each
    device vmaps the fused graph over its LOCAL slice of the proof axis.

    shard_map (manual partitioning) rather than jit+NamedSharding (GSPMD) is
    deliberate: the lanes are fully independent, so the partitioning is
    trivially exact, and handing the un-annotated local program straight to
    XLA avoids the SPMD partitioner on the very large fused graph — round-2's
    GSPMD path sent XLA-CPU's algebraic simplifier into a circular
    simplification loop on the partitioned module (MULTICHIP_r02 timeout).
    Proofs are bit-identical to the single-device batch path (pinned in
    tests/test_sharding.py)."""
    import jax

    from ..plonk.prover_fused import (
        _batch_flat_inputs,
        _build_fused,
        _from_dev_pairs,
        _to_dev_pairs,
        _unpack_proof,
    )

    cfg = data.config
    assert cfg.max_quotient_degree_factor == (1 << cfg.rate_bits)
    rng = np.random.default_rng(seed)

    cache = data.__dict__.get("_fused")
    if cache is None:
        cache = _build_fused(data)
        data.__dict__["_fused"] = cache
    fused_jit, layout, bundle, meta = cache

    flat_in, pis_list = _batch_flat_inputs(data, pws, rng, meta)
    k = len(pws)
    assert k % mesh.shape["proofs"] == 0, "batch must tile the proofs axis"

    key = ("sharded", k, mesh.shape["proofs"])
    cache2 = data.__dict__.setdefault("_fused_batch", {})
    vfused = cache2.get(key)
    if vfused is None:

        def local_prove(flat_local, b):
            return jax.vmap(fused_jit, in_axes=(0, None))(flat_local, b)

        vfused = jax.jit(
            jax.shard_map(
                local_prove,
                mesh=mesh,
                in_specs=(P("proofs"), P()),
                out_specs=P("proofs"),
                check_vma=False,
            )
        )
        cache2[key] = vfused

    out_dev = vfused(_to_dev_pairs(flat_in), bundle)
    flat_out = _from_dev_pairs(out_dev)  # one gather+transfer for the whole batch
    return [
        _unpack_proof(data, flat_out[i], layout, meta, pis_list[i]) for i in range(k)
    ]


def sharded_batch_commit(mesh: Mesh, rate_bits: int = 3, cap_height: int = 1):
    """jit the batch commit step with dp x tp shardings over the mesh."""
    trace_sharding = NamedSharding(mesh, P("proofs", "cols", None))
    cap_sharding = NamedSharding(mesh, P("proofs", None, None))
    lde_sharding = NamedSharding(mesh, P("proofs", "cols", None))

    fn = functools.partial(batch_commit_step, rate_bits=rate_bits, cap_height=cap_height)
    return jax.jit(
        fn,
        in_shardings=(GF(trace_sharding, trace_sharding),),
        out_shardings=(
            GF(cap_sharding, cap_sharding),
            GF(lde_sharding, lde_sharding),
        ),
    )
