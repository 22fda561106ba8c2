"""Fully-fused device prover: ONE jitted graph from witness trace to proof.

Round-1 profiling showed the staged prover (`prover.prove`) spends ~85% of its
wall time in tunnel round-trips: every Merkle cap, FRI layer and opening set
crossed device->host (~41 ms RTT each) so the host Fiat-Shamir challenger
could consume it. This module keeps the ENTIRE post-witness pipeline of the
reference hot loop (SURVEY §3.1: trace LDE -> Poseidon2 Merkle commit ->
permutation argument -> quotient -> FRI commit/fold -> PoW grind -> query
openings) inside a single XLA graph:

  * `DeviceChallenger` mirrors `transcript.Challenger` bit-exactly as
    trace-time logic (the observe/challenge schedule is static per circuit
    shape, so the duplex sponge unrolls into the graph);
  * the proof-of-work grind is an in-graph `lax.while_loop` over batched
    Poseidon2 sweeps;
  * FRI query indices are sampled in-graph and ALL query openings (leaf rows,
    Merkle siblings, fold-layer leaves) are gathered in-graph;
  * every output is packed into ONE flat field vector -> exactly one
    device->host transfer per proof; the host unpacks it into `Proof` with
    pure numpy reshapes.

Per-circuit device-resident inputs (domain tables, preprocessed oracle,
sigma/id columns, FRI twiddles) live in a "bundle" pytree passed to the jit
call, so they are never re-transferred and never baked into the executable.

The transcript schedule is identical to the staged prover and the host
verifier (`plonk/verifier.py`), so proofs are bit-identical to the staged
path for the same witness/seed (pinned in tests/test_plonk.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..field import extension as ext
from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..fri.config import SALT_SIZE
from ..fri.prover import (
    FriProof,
    FriQueryRound,
    FriQueryStep,
    _fold_step,
    _inv_x_table,
    _regroup_leaves,
)
from ..hash import merkle
from ..hash import poseidon2 as ps
from ..poly import ntt
from .builder import CircuitData, PartialWitness, coset_shifts, generate_witness
from .proof import OpeningSet, Proof, fri_instance, zs_pp_layout
from .prover import quotient_run
from .vanishing import num_partial_products, permutation_chunks

P = 0xFFFFFFFF00000001


# ---------------------------------------------------------------------------
# trace-time Fiat-Shamir challenger (mirrors transcript.Challenger exactly)


class DeviceChallenger:
    """Duplex-sponge challenger unrolled at trace time.

    The observe/challenge schedule is static per circuit shape, so the
    input/output buffers are plain Python lists of traced GF scalars; only
    the Poseidon2 permutations become graph ops."""

    def __init__(self):
        self.state = gl.zeros((ps.WIDTH,))
        self.input_buf: list[GF] = []
        self.output_buf: list[GF] = []

    def observe(self, f: GF) -> None:
        self.output_buf = []
        self.input_buf.append(f)
        if len(self.input_buf) == ps.RATE:
            self._duplex()

    def observe_many(self, arr: GF) -> None:
        import jax

        flat = GF(arr.lo.reshape(-1), arr.hi.reshape(-1))
        k = flat.lo.shape[0]
        i = 0
        # scalar absorbs until the input buffer is chunk-aligned (empty)
        while self.input_buf and i < k:
            self.observe(GF(flat.lo[i], flat.hi[i]))
            i += 1
        # bulk path: full-rate chunks as ONE lax.scan (identical duplex
        # semantics, but the permutation is traced once — keeps the graph
        # small for long absorbs like opening sets)
        nfull = (k - i) // ps.RATE
        if nfull >= 2 and not self.input_buf:
            chunks = GF(
                flat.lo[i : i + nfull * ps.RATE].reshape(nfull, ps.RATE),
                flat.hi[i : i + nfull * ps.RATE].reshape(nfull, ps.RATE),
            )

            def body(state, chunk):
                st = gl.concat(
                    [chunk, GF(state.lo[ps.RATE :], state.hi[ps.RATE :])], axis=0
                )
                return ps.permute_j(st), None

            self.state, _ = jax.lax.scan(body, self.state, chunks)
            self.output_buf = [
                GF(self.state.lo[j], self.state.hi[j]) for j in range(ps.RATE)
            ]
            i += nfull * ps.RATE
        for j in range(i, k):
            self.observe(GF(flat.lo[j], flat.hi[j]))

    def _duplex(self) -> None:
        k = len(self.input_buf)
        if k:
            inb = gl.stack(self.input_buf, axis=0)
            st = gl.concat([inb, GF(self.state.lo[k:], self.state.hi[k:])], axis=0)
        else:
            st = self.state
        self.state = ps.permute_j(st)
        self.input_buf = []
        self.output_buf = [
            GF(self.state.lo[i], self.state.hi[i]) for i in range(ps.RATE)
        ]

    def challenge(self) -> GF:
        if self.input_buf or not self.output_buf:
            self._duplex()
        return self.output_buf.pop(0)

    def challenge_many(self, n: int) -> GF:
        return gl.stack([self.challenge() for _ in range(n)], axis=0)

    def challenge_ext(self) -> GF2:
        c0 = self.challenge()
        c1 = self.challenge()
        return GF2(c0, c1)

    def challenge_index_bits(self, bits: int):
        """Query index in [0, 2^bits) (bits <= 32): u64 mod 2^bits == lo & mask."""
        import jax.numpy as jnp

        assert bits <= 32
        c = self.challenge()
        return c.lo & jnp.uint32((1 << bits) - 1)


# ---------------------------------------------------------------------------
# small traced helpers


def _ext_powers_j(z: GF2, n: int) -> GF2:
    """(n,) powers table z^0..z^{n-1} by log-doubling (trace-time loop)."""
    import jax.numpy as jnp

    pows = ext.j_constant(1, 0, shape=(1,))
    zk = z  # z^(2^t) scalar
    while pows.shape[0] < n:
        k = pows.shape[0]
        shifted = ext.j_mul(pows, _bc2(zk, (k,)))
        pows = GF2(
            GF(
                jnp.concatenate([pows.c0.lo, shifted.c0.lo]),
                jnp.concatenate([pows.c0.hi, shifted.c0.hi]),
            ),
            GF(
                jnp.concatenate([pows.c1.lo, shifted.c1.lo]),
                jnp.concatenate([pows.c1.hi, shifted.c1.hi]),
            ),
        )
        zk = ext.j_sqr(zk)
    return GF2(pows.c0[:n], pows.c1[:n])


def _bc2(a: GF2, shape) -> GF2:
    import jax.numpy as jnp

    return GF2(
        GF(jnp.broadcast_to(a.c0.lo, shape), jnp.broadcast_to(a.c0.hi, shape)),
        GF(jnp.broadcast_to(a.c1.lo, shape), jnp.broadcast_to(a.c1.hi, shape)),
    )


def _bc(a: GF, shape) -> GF:
    import jax.numpy as jnp

    return GF(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))


def _prefix_prod_j(a: GF) -> GF:
    """Inclusive prefix product along axis 0 (log-doubling)."""
    import jax.numpy as jnp

    n = a.lo.shape[0]
    shift = 1
    while shift < n:
        lo = jnp.concatenate([jnp.ones((shift,), jnp.uint32), a.lo[:-shift]])
        hi = jnp.concatenate([jnp.zeros((shift,), jnp.uint32), a.hi[:-shift]])
        a = gl.mul(a, GF(lo, hi))
        shift *= 2
    return a


def _eval_coeffs_at(coeffs: GF, zp: GF2) -> GF2:
    """All rows of (C, n) coefficient matrix at the point with powers zp."""
    def part(comp: GF) -> GF:
        t = gl.mul(coeffs, _bc(comp, coeffs.lo.shape))
        y = gl.sum_tree(t, axis=1)
        return GF(y.lo[:, 0], y.hi[:, 0])

    return GF2(part(zp.c0), part(zp.c1))


def _commit_j(values: GF, rate_bits: int, cap_height: int, salt: Optional[GF],
              from_values: bool):
    """In-graph oracle commit. Returns (coeffs (C,n), lde (C_tot,m) incl salt,
    levels list of GF digest levels, leaf count)."""
    coeffs = ntt.intt_j(values) if from_values else values
    lde = ntt.coset_lde_j(coeffs, rate_bits)
    leaves = GF(lde.lo.T, lde.hi.T)  # (m, C)
    if salt is not None:
        leaves = gl.concat([leaves, salt], axis=1)
        lde = gl.concat([lde, GF(salt.lo.T, salt.hi.T)], axis=0)
    cap_h = min(cap_height, (leaves.shape[0]).bit_length() - 1)
    levels = merkle.build_levels_j(leaves, cap_h)
    return coeffs, lde, levels


def _commit_j_sharded(values: GF, rate_bits: int, cap_height: int,
                      salt: Optional[GF], from_values: bool, mesh, axis: str):
    """Mesh-sharded in-graph oracle commit: bit-identical to `_commit_j`.

    Column-block iNTT/LDE per device (zero collectives), ONE tiled
    all_to_all transpose to row blocks for leaf hashing, local subtree
    builds, then a replicated re-gather for the (replicated) downstream
    stages (SURVEY §2.3/§5.8: shard by-polynomial first). Reuses the
    shard_map body of `parallel/tp.py` — the staged and fused tp paths are
    the same program."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..parallel.tp import _commit_body

    C, n = values.shape
    m = n << rate_bits
    D = mesh.shape[axis]
    assert m % D == 0 and (m // D) % D == 0, "need D | M/D for the transpose"
    c_pad = -(-C // D) * D
    if c_pad != C:
        values = gl.concat([values, gl.zeros((c_pad - C, n))], axis=0)
    blinding = salt is not None
    salt_in = salt if blinding else gl.zeros((m, SALT_SIZE))
    cap_h = min(cap_height, m.bit_length() - 1)
    dev_bits = D.bit_length() - 1
    local_levels = (m // D).bit_length() - 1 - max(cap_h - dev_bits, 0)
    local_levels = min(local_levels, m.bit_length() - 1 - cap_h)

    # `gather_out` re-gathers every output to replicated INSIDE the manual
    # region (tiled all_gather), so the out_specs are fully replicated and the
    # [:C] pad-slice below is an ordinary replicated slice. The previous
    # with_sharding_constraint-then-slice re-gather crashed at trace time
    # whenever C was not divisible by the mesh axis (ShardingTypeError at the
    # canonical 135-wire shape) because the constraint does not change the
    # sharded *type* the slice rule sees.
    body = functools.partial(
        _commit_body, axis=axis, n_dev=D, rate_bits=rate_bits,
        from_values=from_values, c_true=C, blinding=blinding,
        local_levels=local_levels, gather_out=True,
    )
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(None, None), P(None, None))
        + tuple(P(None, None) for _ in range(local_levels + 1)),
        check_vma=False,
    )(values, salt_in)
    coeffs_p, lde_p, *levels = out

    coeffs = coeffs_p[:C]
    lde = lde_p[:C]
    if blinding:
        lde = gl.concat([lde, GF(salt.lo.T, salt.hi.T)], axis=0)
    cur = levels[-1]
    while cur.shape[0] > (1 << cap_h):  # finish top levels replicated (tiny)
        cur = ps.two_to_one_j(cur[0::2], cur[1::2])
        levels.append(cur)
    return coeffs, lde, levels


def _grind_j(ch: DeviceChallenger, pow_bits: int, batch: int = 1 << 17) -> GF:
    """In-graph PoW grind (reference 16-bit FRI grind): lax.while_loop over
    batched candidate sweeps; returns the witness as a GF scalar. Matches the
    host `transcript.grind_pow` exactly (lowest-index witness)."""
    import jax
    import jax.numpy as jnp

    if pow_bits == 0:
        return gl.zeros(())
    assert 0 < pow_bits <= 32
    k = len(ch.input_buf)
    if k:
        inb = gl.stack(ch.input_buf, axis=0)
        base = gl.concat([inb, GF(ch.state.lo[k:], ch.state.hi[k:])], axis=0)
    else:
        base = ch.state
    hi_thresh = jnp.uint32(1 << (32 - pow_bits)) if pow_bits < 32 else jnp.uint32(1)
    idx = jnp.arange(batch, dtype=jnp.uint32)

    def body(carry):
        start_lo, start_hi, _, _ = carry
        w_lo = start_lo + idx
        w_hi = start_hi + (w_lo < start_lo).astype(jnp.uint32)
        lo = jnp.broadcast_to(base.lo, (batch, ps.WIDTH)).at[:, k].set(w_lo)
        hi = jnp.broadcast_to(base.hi, (batch, ps.WIDTH)).at[:, k].set(w_hi)
        out = ps.permute_j(GF(lo, hi))
        mask = out.hi[:, 0] < hi_thresh
        found = jnp.any(mask)
        first = jnp.argmax(mask).astype(jnp.uint32)
        nlo = start_lo + jnp.uint32(batch)
        nhi = start_hi + (nlo < start_lo).astype(jnp.uint32)
        w_sel_lo = jnp.where(found, w_lo[first], jnp.uint32(0))
        w_sel_hi = jnp.where(found, w_hi[first], jnp.uint32(0))
        return nlo, nhi, found, jnp.stack([w_sel_lo, w_sel_hi])

    def cond(carry):
        return ~carry[2]

    init = (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False),
            jnp.zeros((2,), jnp.uint32))
    _, _, _, w = jax.lax.while_loop(cond, body, init)
    return GF(w[0], w[1])


class _Packer:
    """Records named GF arrays during tracing; emits one flat GF vector."""

    def __init__(self):
        self.items: list[GF] = []
        self.layout: list[tuple[str, tuple]] = []

    def add(self, name: str, arr: GF) -> None:
        self.layout.append((name, tuple(arr.lo.shape)))
        self.items.append(GF(arr.lo.reshape(-1), arr.hi.reshape(-1)))

    def add_ext(self, name: str, arr: GF2) -> None:
        """Extension array (..., ) -> packed as (..., 2) trailing (c0, c1)."""
        import jax.numpy as jnp

        lo = jnp.stack([arr.c0.lo, arr.c1.lo], axis=-1)
        hi = jnp.stack([arr.c0.hi, arr.c1.hi], axis=-1)
        self.add(name, GF(lo, hi))

    def pack(self) -> GF:
        return gl.concat(self.items, axis=0)


class _Unpacker:
    def __init__(self, flat_u64: np.ndarray, layout):
        self.flat = flat_u64
        self.off = 0
        self.by_name = {}
        for name, shape in layout:
            size = int(np.prod(shape)) if shape else 1
            self.by_name[name] = self.flat[self.off : self.off + size].reshape(shape)
            self.off += size

    def __getitem__(self, name: str) -> np.ndarray:
        return self.by_name[name]


# ---------------------------------------------------------------------------
# the fused graph builder


def _rand_felts_j(key, shape):
    """Uniform canonical felts on device from a threefry key. Two independent
    u64 draws + select (take the second where the first lands in [p, 2^64));
    the 2^-64 residual is canonicalized by conditional subtract. Matches the
    host `F.rand_felts` DISTRIBUTION (uniform over the field), not its
    stream — device_rng proofs are therefore valid but not byte-identical to
    host-rng proofs of the same seed (blinding/salts are free randomness)."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(key)

    def draw(k):
        lo = jax.random.bits(jax.random.fold_in(k, 0), shape, jnp.uint32)
        hi = jax.random.bits(jax.random.fold_in(k, 1), shape, jnp.uint32)
        return lo, hi

    lo1, hi1 = draw(k1)
    lo2, hi2 = draw(k2)
    bad1 = (hi1 == jnp.uint32(0xFFFFFFFF)) & (lo1 >= jnp.uint32(1))
    lo = jnp.where(bad1, lo2, lo1)
    hi = jnp.where(bad1, hi2, hi1)
    return gl._canonicalize(lo, hi)


def _build_fused(data: CircuitData, device_rng: bool = False, mesh=None,
                 tp_axis: str | None = None):
    """Build the fused single-graph prover. With `mesh`, the three oracle
    commits (iNTT + coset-LDE + Poseidon2 Merkle — the device-time majority,
    tools_roofline) run tensor-parallel across the mesh inside the SAME
    graph (`_commit_j_sharded`), bit-identical output."""
    import jax
    import jax.numpy as jnp

    cfg = data.config
    fcfg = cfg.fri_config
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    nw = cfg.num_wires
    qdf = cfg.max_quotient_degree_factor
    rate_bits = cfg.rate_bits
    cap_h = fcfg.cap_height
    n = data.n
    m = n << rate_bits
    lde_bits = data.degree_bits + rate_bits
    zk = cfg.zero_knowledge
    nconst = data.const_cols.shape[0]
    nsel = data.num_selectors
    npre = data.num_preprocessed
    chunks = permutation_chunks(nr, qdf)
    npp = num_partial_products(nr, qdf)
    nz, npp_total = zs_pp_layout(cfg)
    schedule = fcfg.reduction_strategy.schedule(data.degree_bits)
    final_len = min(
        1 << fcfg.reduction_strategy.final_poly_bits,
        1 << (data.degree_bits - sum(schedule)),
    )
    nq = fcfg.num_query_rounds
    g_n = int(F.primitive_root_of_unity(data.degree_bits))

    # ---- device-resident per-circuit bundle (transferred once) ----
    xs_host = F.mul(
        F.powers_table(F.primitive_root_of_unity(lde_bits), m),
        F.MULTIPLICATIVE_GROUP_GENERATOR,
    )
    xn = F.pow_scalar(xs_host, n)
    zh = F.sub(xn, np.uint64(1))
    inv_zh_host = F.inv(zh)
    l1_host = F.mul(zh, F.inv(F.mul(np.uint64(n), F.sub(xs_host, np.uint64(1)))))
    inv_shift_pows_host = F.powers_table(F.inv(F.MULTIPLICATIVE_GROUP_GENERATOR), m)

    inv_x_tables = []
    log_m_t, shift_pow_t = lde_bits, 0
    for a_bits in schedule:
        for _ in range(a_bits):
            inv_x_tables.append(gl.from_u64(_inv_x_table(log_m_t, shift_pow_t)))
            log_m_t -= 1
            shift_pow_t += 1
    final_shift_pow = shift_pow_t
    final_inv_shift = F.powers_table(
        F.inv(F.pow_scalar(F.MULTIPLICATIVE_GROUP_GENERATOR, 1 << final_shift_pow)),
        1 << (lde_bits - sum(schedule)),
    )

    const_levels_dev = [
        gl.from_u64(lv) for lv in data.constants_oracle.tree.levels
    ]
    bundle = {
        "xs": gl.from_u64(xs_host),
        "l1": gl.from_u64(l1_host),
        "inv_zh": gl.from_u64(inv_zh_host),
        "inv_shift_pows": gl.from_u64(inv_shift_pows_host),
        "final_inv_shift": gl.from_u64(final_inv_shift),
        "inv_x": inv_x_tables,
        "const_lde": data.constants_oracle.lde,
        "const_coeffs": data.constants_oracle.coeffs_dev,
        "const_levels": const_levels_dev,
        "sigma": gl.from_u64(data.sigma_vals),
        "ids": gl.from_u64(data.id_coords),
        "digest": gl.from_u64(np.asarray(data.circuit_digest, dtype=np.uint64)),
    }

    quotient_body = quotient_run(data)
    layout: list = []

    if mesh is not None:
        ax = tp_axis or mesh.axis_names[0]

        def commit(vals, salt_arr, from_values):
            return _commit_j_sharded(
                vals, rate_bits, cap_h, salt_arr, from_values, mesh, ax
            )
    else:

        def commit(vals, salt_arr, from_values):
            return _commit_j(vals, rate_bits, cap_h, salt_arr, from_values)

    # static salt sizes per oracle (wires, zs_pp, quotient)
    n_salt = SALT_SIZE if zk else 0

    # non-ZK circuits (and ZK circuits in device_rng mode) upload only the
    # distinct witness values; the trace is scattered on device (static index
    # tables baked into the graph). Host-rng ZK keeps the dense-trace upload
    # for bit-identity with the staged path; device_rng generates the
    # blinding rows + oracle salts in-graph from a threefry key, cutting the
    # per-proof upload from O(num_wires * lde) to O(witness values) — the
    # dominant cost of the canonical private batch (166+ MB of host-drawn
    # randomness shipped over the tunnel per proof otherwise).
    if not zk or device_rng:
        from .builder import witness_scatter_tables

        roots_order, _, cell_flat_np, cell_slot_np = witness_scatter_tables(data)
        n_slots = len(roots_order)
    rows_used = data.num_rows_used

    def fused(flat2, b, key=None):
        # flat2: (L, 2) uint32 — little-endian (lo, hi) pairs, i.e. the raw
        # u64 witness buffer viewed as u32. ONE host->device buffer instead
        # of two (the tunnel charges per transfer, not just per byte).
        flat_in = GF(flat2[:, 0], flat2[:, 1])
        pk = _Packer()

        # ---- unpack inputs ----
        off = 0

        def take(size, shape):
            nonlocal off
            part = GF(
                flat_in.lo[off : off + size].reshape(shape),
                flat_in.hi[off : off + size].reshape(shape),
            )
            off += size
            return part

        def scatter_trace(vals):
            cell_slot = jnp.asarray(cell_slot_np)
            cell_flat = jnp.asarray(cell_flat_np)
            return GF(
                jnp.zeros(nw * n, jnp.uint32).at[cell_flat].set(vals.lo[cell_slot]),
                jnp.zeros(nw * n, jnp.uint32).at[cell_flat].set(vals.hi[cell_slot]),
            ).reshape((nw, n))

        if zk and not device_rng:
            trace = take(nw * n, (nw, n))
        elif zk:
            import jax

            vals = take(n_slots, (n_slots,))
            blind = _rand_felts_j(jax.random.fold_in(key, 0), (nw, n - rows_used))
            scattered = scatter_trace(vals)
            trace = GF(
                jnp.concatenate([scattered.lo[:, :rows_used], blind.lo], axis=1),
                jnp.concatenate([scattered.hi[:, :rows_used], blind.hi], axis=1),
            )
        else:
            trace = scatter_trace(take(n_slots, (n_slots,)))
        pi_hash = take(4, (4,))
        if zk and device_rng:
            import jax

            salts = [
                _rand_felts_j(jax.random.fold_in(key, 1 + i), (m, n_salt))
                for i in range(3)
            ]
        elif zk:
            salts = [take(m * n_salt, (m, n_salt)) for _ in range(3)]
        else:
            salts = [None] * 3

        ch = DeviceChallenger()
        ch.observe_many(b["digest"])
        ch.observe_many(pi_hash)

        # ---- wires oracle ----
        w_coeffs, w_lde, w_levels = commit(trace, salts[0], True)
        pk.add("wires_cap", w_levels[-1])
        ch.observe_many(w_levels[-1])
        betas = ch.challenge_many(nc)
        gammas = ch.challenge_many(nc)

        # ---- permutation argument (device prefix products) ----
        routed_t = trace[:nr]  # (nr, n) values over H
        zs_list, pps_list = [], []
        for c in range(nc):
            beta = _bc(betas[c], (nr, n))
            gamma = _bc(gammas[c], (nr, n))
            num = gl.add(gl.add(routed_t, gl.mul(beta, b["ids"])), gamma)
            den = gl.add(gl.add(routed_t, gl.mul(beta, b["sigma"])), gamma)
            cns, cds = [], []
            for chunk in chunks:
                pn, pd = num[chunk[0]], den[chunk[0]]
                for i in chunk[1:]:
                    pn = gl.mul(pn, num[i])
                    pd = gl.mul(pd, den[i])
                cns.append(pn)
                cds.append(pd)
            cn = gl.stack(cns, axis=0)  # (nchunks, n)
            cd = gl.stack(cds, axis=0)
            ratios = gl.mul(cn, gl.inv(cd))
            row_ratio = ratios[0]
            for j in range(1, len(chunks)):
                row_ratio = gl.mul(row_ratio, ratios[j])
            z_incl = _prefix_prod_j(row_ratio)
            z = gl.concat([gl.ones((1,)), z_incl[:-1]], axis=0)
            zs_list.append(z)
            run_p = z
            for j in range(npp):
                run_p = gl.mul(run_p, ratios[j])
                pps_list.append(run_p)
        zpp = gl.stack(zs_list + pps_list, axis=0)  # (nz+npp_total, n)

        z_coeffs, z_lde, z_levels = commit(zpp, salts[1], True)
        pk.add("zs_pp_cap", z_levels[-1])
        ch.observe_many(z_levels[-1])
        alphas = ch.challenge_many(nc)

        # ---- quotient ----
        t_chunks = quotient_body(
            w_lde, b["const_lde"], z_lde, alphas, betas, gammas, pi_hash,
            b["xs"], b["l1"], b["inv_zh"], b["inv_shift_pows"],
        )
        q_coeffs, q_lde, q_levels = commit(t_chunks, salts[2], False)
        pk.add("quotient_cap", q_levels[-1])
        ch.observe_many(q_levels[-1])
        zeta = ch.challenge_ext()
        zeta_next = ext.j_scalar_mul(zeta, gl.constant(g_n))

        # ---- openings ----
        zp = _ext_powers_j(zeta, n)
        zpn = _ext_powers_j(zeta_next, n)
        consts_open = _eval_coeffs_at(b["const_coeffs"], zp)  # (npre,)
        wires_open = _eval_coeffs_at(w_coeffs, zp)  # (nw,)
        zpp_open = _eval_coeffs_at(z_coeffs, zp)  # (nz+npp_total,)
        quot_open = _eval_coeffs_at(q_coeffs, zp)  # (nc*qdf,)
        zs_next_open = _eval_coeffs_at(z_coeffs[:nz], zpn)  # (nz,)

        def cat2(parts):
            return GF2(
                GF(
                    jnp.concatenate([p.c0.lo for p in parts]),
                    jnp.concatenate([p.c0.hi for p in parts]),
                ),
                GF(
                    jnp.concatenate([p.c1.lo for p in parts]),
                    jnp.concatenate([p.c1.hi for p in parts]),
                ),
            )

        batch_zeta = cat2([consts_open, wires_open, zpp_open, quot_open])
        pk.add_ext("openings_zeta", batch_zeta)
        pk.add_ext("openings_zeta_next", zs_next_open)
        ch.observe_many(_interleave_ext(batch_zeta))
        ch.observe_many(_interleave_ext(zs_next_open))

        # ---- FRI ----
        alpha = ch.challenge_ext()
        n_terms = batch_zeta.shape[0] + nz
        apows = _ext_powers_j(alpha, n_terms)
        # batch 0: all columns at zeta; batch 1: zs at zeta_next
        xz0 = GF2(
            gl.sub(b["xs"], _bc(zeta.c0, (m,))),
            gl.sub(gl.zeros((m,)), _bc(zeta.c1, (m,))),
        )
        xz1 = GF2(
            gl.sub(b["xs"], _bc(zeta_next.c0, (m,))),
            gl.sub(gl.zeros((m,)), _bc(zeta_next.c1, (m,))),
        )
        inv0, inv1 = ext.j_inv(xz0), ext.j_inv(xz1)
        # batch column stacks over the LDEs (salt columns excluded)
        cols0 = gl.concat(
            [b["const_lde"][:npre], w_lde[:nw], z_lde[: nz + npp_total],
             q_lde[: nc * qdf]],
            axis=0,
        )  # (n_terms0, m)
        cols1 = z_lde[:nz]
        k0 = batch_zeta.shape[0]
        q_vals = None
        for (cols, ys, invs, a_off, kk) in (
            (cols0, batch_zeta, inv0, 0, k0),
            (cols1, zs_next_open, inv1, k0, nz),
        ):
            ap = GF2(apows.c0[a_off : a_off + kk], apows.c1[a_off : a_off + kk])
            t0 = gl.mul(cols, _bc(GF(ap.c0.lo[:, None], ap.c0.hi[:, None]), cols.lo.shape))
            t1 = gl.mul(cols, _bc(GF(ap.c1.lo[:, None], ap.c1.hi[:, None]), cols.lo.shape))
            s0 = gl.sum_tree(t0, axis=0)
            s1 = gl.sum_tree(t1, axis=0)
            s_b = GF2(GF(s0.lo[0], s0.hi[0]), GF(s1.lo[0], s1.hi[0]))  # (m,)
            # c_b = sum_k alpha^k * y_k in the extension
            prod = ext.j_mul(ap, ys)
            cb = GF2(
                GF(gl.sum_tree(prod.c0, axis=0).lo[0], gl.sum_tree(prod.c0, axis=0).hi[0]),
                GF(gl.sum_tree(prod.c1, axis=0).lo[0], gl.sum_tree(prod.c1, axis=0).hi[0]),
            )
            num_q = ext.j_sub(s_b, _bc2(cb, (m,)))
            contrib = ext.j_mul(num_q, invs)
            q_vals = contrib if q_vals is None else ext.j_add(q_vals, contrib)

        # commit/fold phase
        values = q_vals  # GF2 (m,)
        layer_leaves, layer_levels = [], []
        fold_i = 0
        log_m_cur = lde_bits
        for a_bits in schedule:
            leaves = _regroup_leaves(values, a_bits)
            l_cap_h = min(cap_h, log_m_cur - a_bits)
            levels = merkle.build_levels_j(leaves, l_cap_h)
            layer_leaves.append(leaves)
            layer_levels.append(levels)
            pk.add(f"fri_cap_{len(layer_leaves)-1}", levels[-1])
            ch.observe_many(levels[-1])
            beta = ch.challenge_ext()
            beta_t = beta
            for _ in range(a_bits):
                values = _fold_step(values, beta_t, b["inv_x"][fold_i])
                beta_t = ext.j_sqr(beta_t)
                fold_i += 1
                log_m_cur -= 1

        # final polynomial (coset iNTT on the remaining values)
        fin = gl.stack([values.c0, values.c1], axis=0)  # (2, mf)
        fin_coeffs = ntt.intt_j(fin)
        fin_coeffs = gl.mul(fin_coeffs, _bc(GF(b["final_inv_shift"].lo[None, :], b["final_inv_shift"].hi[None, :]), fin_coeffs.lo.shape))
        final_poly = GF2(fin_coeffs[0][:final_len], fin_coeffs[1][:final_len])
        pk.add_ext("final_poly", final_poly)
        ch.observe_many(_interleave_ext(final_poly))

        # PoW grind
        # sweep = the expected try count (2^pow_bits): E[sweeps] ~= 1.6, so
        # expected grind work ~= 1.6x the minimum — half the cost of the old
        # 2^(bits+1) sweeps; small PoW budgets (tests, CPU dryruns) stay cheap
        pow_w = _grind_j(
            ch,
            fcfg.proof_of_work_bits,
            batch=1 << min(16, fcfg.proof_of_work_bits),
        )
        pk.add("pow_witness", GF(pow_w.lo.reshape(1), pow_w.hi.reshape(1)))
        ch.observe(pow_w)
        ch.challenge()  # pow response consumed (verified host-side)

        # ---- queries (indices + ALL openings in-graph) ----
        idxs = jnp.stack(
            [ch.challenge_index_bits(lde_bits) for _ in range(nq)]
        )  # (nq,) uint32
        pk.add("query_indices", GF(idxs, jnp.zeros_like(idxs)))
        idx64 = idxs.astype(jnp.int32)

        for oi, (lde, levels) in enumerate(
            (
                (b["const_lde"], b["const_levels"]),
                (w_lde, w_levels),
                (z_lde, z_levels),
                (q_lde, q_levels),
            )
        ):
            rows = GF(lde.lo[:, idx64].T, lde.hi[:, idx64].T)  # (nq, C_tot)
            pk.add(f"init_rows_{oi}", rows)
            sibs = []
            for li in range(len(levels) - 1):
                pos = (idx64 >> li) ^ 1
                sibs.append(levels[li][pos])  # (nq, 4)
            if sibs:
                pk.add(f"init_sibs_{oi}", gl.stack(sibs, axis=1))  # (nq, L, 4)
            else:
                pk.add(f"init_sibs_{oi}", gl.zeros((nq, 0, 4)))

        q_cur = idx64
        for li, a_bits in enumerate(schedule):
            mp = layer_leaves[li].shape[0]
            q_cur = q_cur & jnp.int32(mp - 1)
            pk.add(f"step_leaves_{li}", layer_leaves[li][q_cur])  # (nq, 2^(a+1))
            levels = layer_levels[li]
            sibs = []
            for lj in range(len(levels) - 1):
                pos = (q_cur >> lj) ^ 1
                sibs.append(levels[lj][pos])
            if sibs:
                pk.add(f"step_sibs_{li}", gl.stack(sibs, axis=1))
            else:
                pk.add(f"step_sibs_{li}", gl.zeros((nq, 0, 4)))

        layout.clear()
        layout.extend(pk.layout)
        packed = pk.pack()
        # ONE device->host buffer: (L_out, 2) u32 rows view as u64 on host
        return jnp.stack([packed.lo, packed.hi], axis=-1)

    fused_jit = jax.jit(fused)
    meta = {
        "schedule": schedule,
        "final_len": final_len,
        "n_salt": n_salt,
        "m": m,
        "nz": nz,
        "npp_total": npp_total,
        "npre": npre,
        "nconst": nconst,
        "nsel": nsel,
    }
    return fused_jit, layout, bundle, meta


def _interleave_ext(arr: GF2) -> GF:
    """(k,) extension -> (2k,) felts in (c0, c1) per-element order (matches the
    host challenger's observe_many over (k, 2) arrays)."""
    import jax.numpy as jnp

    lo = jnp.stack([arr.c0.lo, arr.c1.lo], axis=-1).reshape(-1)
    hi = jnp.stack([arr.c0.hi, arr.c1.hi], axis=-1).reshape(-1)
    return GF(lo, hi)


# ---------------------------------------------------------------------------
# host entry


def _to_dev_pairs(flat_u64: np.ndarray):
    """u64 host buffer -> ONE (..., 2)-u32 device buffer (little-endian view,
    zero-copy on host)."""
    import jax

    return jax.device_put(flat_u64.view(np.uint32).reshape(flat_u64.shape + (2,)))


def _from_dev_pairs(out_dev) -> np.ndarray:
    """(..., 2)-u32 device buffer -> u64 host array, ONE device->host fetch."""
    arr = np.ascontiguousarray(np.asarray(out_dev))
    return arr.view(np.uint64).reshape(arr.shape[:-1])


def _flat_input(data: CircuitData, pw: PartialWitness, rng, meta) -> tuple:
    """Host side of one proof: witness values (+ salts for ZK), flattened in
    the order the fused graph unpacks them. Returns (flat_u64, public_inputs).

    Non-ZK circuits ship only the distinct witness values (the device
    scatters the trace); ZK circuits ship the dense blinded trace."""
    if not data.config.zero_knowledge:
        return _flat_values(data, pw)

    trace, pis = generate_witness(data, pw, rng)
    pi_hash = ps.hash_no_pad(pis)
    parts = [np.asarray(trace, dtype=np.uint64).ravel(), np.asarray(pi_hash)]
    # same salt-draw order as the staged prover: one seeded stream per
    # oracle, drawn wires -> zs_pp -> quotient
    for _ in range(3):
        salt_rng = np.random.default_rng(int(rng.integers(0, 2**63)))
        parts.append(F.rand_felts((meta["m"], meta["n_salt"]), salt_rng).ravel())
    return np.concatenate(parts), pis


def _flat_values(data: CircuitData, pw: PartialWitness):
    """Values-only payload (device scatters the trace): non-ZK circuits and
    ZK circuits in device_rng mode. Native witness tape + numpy gathers."""
    import time

    from .builder import witness_root_values, witness_scatter_tables

    t0 = time.perf_counter()
    arr = witness_root_values(data, pw)
    t1 = time.perf_counter()
    roots_order, _, _, _ = witness_scatter_tables(data)
    ro = data.__dict__.get("_roots_order_arr")
    if ro is None:
        ro = np.asarray(roots_order, dtype=np.int64)
        data.__dict__["_roots_order_arr"] = ro
    vals = arr[ro]
    pis = arr[np.asarray(data.public_input_targets, dtype=np.int64)]
    pi_hash = ps.hash_no_pad(pis)
    out = np.concatenate([vals, np.asarray(pi_hash)])
    data.__dict__["_witness_timings"] = {
        "wit_tape_s": round(t1 - t0, 4),
        "wit_gather_s": round(time.perf_counter() - t1, 4),
    }
    return out, pis


def _unpack_proof(data: CircuitData, flat_out: np.ndarray, layout, meta, pis) -> Proof:
    """Rebuild a Proof from one packed output vector (pure numpy reshapes)."""
    cfg = data.config
    u = _Unpacker(flat_out, layout)

    nc = cfg.num_challenges
    nz, npp_total = zs_pp_layout(cfg)
    nw = cfg.num_wires
    nr = cfg.num_routed_wires
    nconst = meta["nconst"]
    nsel = meta["nsel"]
    qn = nc * cfg.max_quotient_degree_factor

    bz = u["openings_zeta"]  # (k0, 2)
    o = 0
    constants = bz[o : o + nconst]; o += nconst
    selectors = bz[o : o + nsel]; o += nsel
    sigmas = bz[o : o + nr]; o += nr
    wires = bz[o : o + nw]; o += nw
    zs = bz[o : o + nz]; o += nz
    pps = bz[o : o + npp_total]; o += npp_total
    quotient = bz[o : o + qn]; o += qn
    openings = OpeningSet(
        constants=constants, selectors=selectors, sigmas=sigmas, wires=wires,
        zs=zs, zs_next=u["openings_zeta_next"], pps=pps, quotient=quotient,
    )

    schedule = meta["schedule"]
    caps = [u[f"fri_cap_{i}"] for i in range(len(schedule))]
    query_rounds = []
    for qi in range(cfg.fri_config.num_query_rounds):
        initial_rows = [u[f"init_rows_{oi}"][qi] for oi in range(4)]
        initial_sibs = [u[f"init_sibs_{oi}"][qi] for oi in range(4)]
        steps = []
        for li in range(len(schedule)):
            steps.append(
                FriQueryStep(
                    leaf_values=u[f"step_leaves_{li}"][qi].reshape(-1, 2),
                    siblings=u[f"step_sibs_{li}"][qi],
                )
            )
        query_rounds.append(
            FriQueryRound(
                initial_rows=initial_rows,
                initial_siblings=initial_sibs,
                steps=steps,
            )
        )
    fri_proof = FriProof(
        commit_caps=caps,
        final_poly=u["final_poly"],
        pow_witness=np.uint64(u["pow_witness"][0]),
        query_rounds=query_rounds,
    )
    return Proof(
        wires_cap=u["wires_cap"],
        zs_pp_cap=u["zs_pp_cap"],
        quotient_cap=u["quotient_cap"],
        openings=openings,
        fri_proof=fri_proof,
        public_inputs=pis,
    )


def _batch_flat_inputs(data: CircuitData, pws: list, rng, meta):
    """(K, in_len) stacked fused-graph inputs + per-proof public inputs.
    Non-ZK circuits use the batched witness engine (ONE fixpoint pass for
    all K proofs); ZK circuits fall back to per-proof generation (their
    blinding/salt rng draws are per-proof streams)."""
    if not data.config.zero_knowledge:
        import os

        if os.environ.get("QZKT_BATCH_WITNESS"):
            # numpy-vectorized engine: one fixpoint for all K proofs. Wins
            # only at large K (numpy per-op overhead ~ scalar ints x 30);
            # the scalar record-and-replay path below is faster for K <~ 48.
            from .builder import witness_batch_inputs

            vals, pis_arr = witness_batch_inputs(data, pws)
            pi_hashes = np.stack(
                [ps.hash_no_pad(pis_arr[i]) for i in range(len(pws))]
            )
            return np.concatenate([vals, pi_hashes], axis=1), list(pis_arr)
        flats, pis_list = [], []
        for pw in pws:
            flat, pis = _flat_input(data, pw, rng, None)
            flats.append(flat)
            pis_list.append(pis)
        return np.stack(flats), pis_list
    flats, pis_list = [], []
    for pw in pws:
        flat, pis = _flat_input(data, pw, rng, meta)
        flats.append(flat)
        pis_list.append(pis)
    return np.stack(flats), pis_list


def prove_fused_batch(
    data: CircuitData, pws: list, seed: int | None = None
) -> list:
    """Batched fused prover: K independent proofs of the SAME circuit in one
    device round-trip.

    This is the TPU-native replacement for the reference's embarrassingly-
    parallel leaf proving (SURVEY §2.3: N≤64 independent leaf proofs proven
    concurrently by deployment) — the whole fused pipeline is `jax.vmap`'d
    over the proof axis, so the MXU sees K-wide batched NTTs/hashes and the
    host pays ONE tunnel round-trip for the entire batch instead of one per
    proof. The per-proof transcript schedules are independent (vmap of the
    PoW `while_loop` masks finished lanes' carries, so each lane keeps its
    own lowest-index witness)."""
    import jax

    cfg = data.config
    assert cfg.max_quotient_degree_factor == (1 << cfg.rate_bits), (
        "quotient evaluation reuses the rate-blowup LDE domain; qdf must equal 2^rate_bits"
    )
    rng = np.random.default_rng(seed)

    cache = data.__dict__.get("_fused")
    if cache is None:
        cache = _build_fused(data)
        data.__dict__["_fused"] = cache
    fused_jit, layout, bundle, meta = cache

    flat_in, pis_list = _batch_flat_inputs(data, pws, rng, meta)

    batch_cache = data.__dict__.setdefault("_fused_batch", {})
    k = len(pws)
    vfused = batch_cache.get(k)
    if vfused is None:
        vfused = jax.jit(jax.vmap(fused_jit, in_axes=(0, None)))
        batch_cache[k] = vfused

    out_dev = vfused(_to_dev_pairs(flat_in), bundle)
    flat_out = _from_dev_pairs(out_dev)  # ONE device->host transfer for K proofs
    return [
        _unpack_proof(data, flat_out[i], layout, meta, pis_list[i])
        for i in range(k)
    ]


def prove_fused_stream(
    data: CircuitData, pws, batch: int, seed: int | None = None, total: int | None = None
) -> list:
    """Sustained-throughput proving: split `pws` into `batch`-sized chunks
    and PIPELINE them — host-side work for chunk i+1 (witness generation when
    `pws` is a lazy iterator, input packing, and the previous chunk's proof
    unpacking) overlaps the device execution of chunk i (JAX dispatch is
    asynchronous; only the result fetch blocks). Steady-state cost per chunk
    is max(host_work, device_compute + transfer) instead of their sum.

    `pws` may be a list or any iterable (e.g. a generator that fills
    witnesses on demand); its length must tile `batch` (`total` sizes the
    check for iterators)."""
    import itertools

    import jax

    cfg = data.config
    assert cfg.max_quotient_degree_factor == (1 << cfg.rate_bits)
    n_total = total if total is not None else len(pws)
    assert n_total % batch == 0, "stream length must tile the batch size"
    rng = np.random.default_rng(seed)

    cache = data.__dict__.get("_fused")
    if cache is None:
        cache = _build_fused(data)
        data.__dict__["_fused"] = cache
    fused_jit, layout, bundle, meta = cache
    batch_cache = data.__dict__.setdefault("_fused_batch", {})
    vfused = batch_cache.get(batch)
    if vfused is None:
        vfused = jax.jit(jax.vmap(fused_jit, in_axes=(0, None)))
        batch_cache[batch] = vfused

    proofs: list = []
    pending = None  # (device output, pis_list) of the in-flight chunk

    def drain(p):
        out_dev, pis_list = p
        flat_out = _from_dev_pairs(out_dev)  # blocks on the device
        proofs.extend(
            _unpack_proof(data, flat_out[i], layout, meta, pis_list[i])
            for i in range(len(pis_list))
        )

    it = iter(pws)
    for _ in range(n_total // batch):
        chunk = list(itertools.islice(it, batch))  # lazy witness fills run HERE,
        # while the previous chunk is still executing on device
        flat_in, pis_list = _batch_flat_inputs(data, chunk, rng, meta)
        out_dev = vfused(_to_dev_pairs(flat_in), bundle)  # async dispatch
        if pending is not None:
            drain(pending)
        pending = (out_dev, pis_list)
    drain(pending)
    return proofs


def prove_fused(
    data: CircuitData,
    pw: PartialWitness,
    seed: int | None = None,
    rng_mode: str = "auto",
    mesh=None,
) -> Proof:
    """rng_mode: 'host' draws ZK blinding/salts on the host (bit-identical to
    the staged prover for the same seed — the differential-test invariant);
    'device' generates them in-graph from a threefry key, shipping only the
    witness values (O(100x) smaller upload for the canonical private batch);
    'auto' uses 'device' iff `warmup_fused` built the device-rng graph.

    `mesh` runs the oracle commits tensor-parallel across the mesh inside
    the same fused graph (`_commit_j_sharded`) — byte-identical proofs."""
    import time

    cfg = data.config
    assert cfg.max_quotient_degree_factor == (1 << cfg.rate_bits), (
        "quotient evaluation reuses the rate-blowup LDE domain; qdf must equal 2^rate_bits"
    )
    rng = np.random.default_rng(seed)

    tp_sfx = "_tp" if mesh is not None else ""
    use_dev = cfg.zero_knowledge and (
        rng_mode == "device"
        or (rng_mode == "auto" and ("_fused_dev" + tp_sfx) in data.__dict__)
    )
    slot = ("_fused_dev" if use_dev else "_fused") + tp_sfx
    cache = data.__dict__.get(slot)
    if cache is None:
        cache = _build_fused(data, device_rng=use_dev, mesh=mesh)
        data.__dict__[slot] = cache
    fused_jit, layout, bundle, meta = cache

    t0 = time.perf_counter()
    if use_dev:
        import jax

        flat_in, pis = _flat_values(data, pw)
        key = jax.random.PRNGKey(int(rng.integers(0, 2**63)))
        t1 = time.perf_counter()
        in_dev = _to_dev_pairs(flat_in)
        t1u = time.perf_counter()
        out_dev = fused_jit(in_dev, bundle, key)
        t1d = time.perf_counter()  # async dispatch done; fetch blocks below
        split = _maybe_split_exec(out_dev)  # diagnostics only (costs an RTT)
        flat_out = _from_dev_pairs(out_dev)  # exactly ONE device->host transfer
        t2 = time.perf_counter()
        proof = _unpack_proof(data, flat_out, layout, meta, pis)
        data.__dict__["_last_prove_timings"] = {
            "witness_pack_s": round(t1 - t0, 4),
            "device_roundtrip_s": round(t2 - t1, 4),
            "upload_s": round(t1u - t1, 4),
            "dispatch_s": round(t1d - t1u, 4),
            "execute_fetch_s": round(t2 - t1d, 4),
            **split,
            "unpack_s": round(time.perf_counter() - t2, 4),
            "flat_in_mb": round(flat_in.nbytes / 1e6, 1),
            "flat_out_mb": round(flat_out.nbytes / 1e6, 1),
            "rng_mode": "device",
            **data.__dict__.pop("_witness_timings", {}),
        }
        return proof

    flat_in, pis = _flat_input(data, pw, rng, meta)
    t1 = time.perf_counter()
    in_dev = _to_dev_pairs(flat_in)
    t1u = time.perf_counter()
    out_dev = fused_jit(in_dev, bundle)
    t1d = time.perf_counter()
    split = _maybe_split_exec(out_dev)  # diagnostics only (costs an RTT)
    flat_out = _from_dev_pairs(out_dev)  # exactly ONE device->host transfer
    t2 = time.perf_counter()
    proof = _unpack_proof(data, flat_out, layout, meta, pis)
    # phase breakdown for perf tooling (host witness+pack | upload+execute+
    # download | host unpack); negligible overhead, read by tools_bench_agg
    data.__dict__["_last_prove_timings"] = {
        "witness_pack_s": round(t1 - t0, 4),
        "device_roundtrip_s": round(t2 - t1, 4),
        "upload_s": round(t1u - t1, 4),
        "dispatch_s": round(t1d - t1u, 4),
        "execute_fetch_s": round(t2 - t1d, 4),
        **split,
        "unpack_s": round(time.perf_counter() - t2, 4),
        "flat_in_mb": round(flat_in.nbytes / 1e6, 1),
        "flat_out_mb": round(flat_out.nbytes / 1e6, 1),
        "rng_mode": "host",
        **data.__dict__.pop("_witness_timings", {}),
    }
    return proof


def _maybe_split_exec(out_dev) -> dict:
    """Opt-in (QZKT_SPLIT_EXEC=1) decomposition of the execute_fetch blob
    into device execute vs tunnel fetch (VERDICT r4 #5: the decision datum
    for the leaf-latency work). The block_until_ready costs ~one extra
    tunnel RTT on this host, so production proves never pay it."""
    import os
    import time

    if not os.environ.get("QZKT_SPLIT_EXEC"):
        return {}
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(out_dev)
    return {"execute_s": round(time.perf_counter() - t0, 4)}
