"""PLONK prover: trace -> commitments -> permutation argument -> quotient -> FRI.

The reference's hot loop (SURVEY §3.1: "witness generation -> trace LDE ->
Poseidon2 Merkle commit -> constraint/quotient eval over LDE -> FRI") mapped
TPU-first:

  * trace interpolation, LDEs, Merkle levels, the whole constraint/quotient
    evaluation and the FRI folds are batched device graphs (jitted once per
    circuit shape, cached on CircuitData);
  * witness generation, transcripts, opening bookkeeping and proof assembly
    stay on host;
  * the permutation argument's running products use log-doubling prefix
    products (vectorised, no sequential scan).
"""

from __future__ import annotations

import numpy as np

from ..field import extension as ext
from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.goldilocks import GF
from ..fri import oracle as fo
from ..fri.prover import fri_prove
from ..hash import poseidon2 as ps
from ..poly import ntt
from . import transcript as ts
from .builder import CircuitData, PartialWitness, generate_witness
from .gates import DeviceBaseCtx
from .proof import OpeningSet, Proof, fri_instance, zs_pp_layout
from .vanishing import DeviceAlg, eval_constraints, num_partial_products, permutation_chunks

P = 0xFFFFFFFF00000001


def _prefix_prod_inclusive(a: np.ndarray) -> np.ndarray:
    """Inclusive prefix field product along axis 0 (log-doubling, vectorised)."""
    out = a.copy()
    shift = 1
    n = out.shape[0]
    while shift < n:
        out[shift:] = F.mul(out[shift:], out[:-shift])
        shift *= 2
    return out


def compute_permutation_polys(data: CircuitData, trace: np.ndarray, betas, gammas):
    """Z and partial-product columns per challenge -> (num_cols, n) u64."""
    cfg = data.config
    nr = cfg.num_routed_wires
    qdf = cfg.max_quotient_degree_factor
    chunks = permutation_chunks(nr, qdf)
    npp = num_partial_products(nr, qdf)
    wires = trace[:nr]  # (nr, n)
    zs, pps = [], []
    for c in range(cfg.num_challenges):
        beta, gamma = np.uint64(betas[c]), np.uint64(gammas[c])
        num = F.add(F.add(wires, F.mul(beta, data.id_coords)), gamma)
        den = F.add(F.add(wires, F.mul(beta, data.sigma_vals)), gamma)
        cn = np.stack([_colprod(num[ch]) for ch in chunks])  # (nchunks, n)
        cd = np.stack([_colprod(den[ch]) for ch in chunks])
        cd_inv = F.inv(cd)
        ratios = F.mul(cn, cd_inv)  # (nchunks, n)
        row_ratio = _colprod(ratios)
        z_incl = _prefix_prod_inclusive(row_ratio)
        z = np.concatenate([[np.uint64(1)], z_incl[:-1]])
        zs.append(z)
        # pp_j = Z * prod_{t<=j} ratios_t  for j < npp
        run = z.copy()
        for j in range(npp):
            run = F.mul(run, ratios[j])
            pps.append(run.copy())
    return np.stack(zs + pps)  # [Z_0, Z_1, pp_0_*, pp_1_*]? see note below


def _colprod(a: np.ndarray) -> np.ndarray:
    out = a[0].copy()
    for i in range(1, a.shape[0]):
        out = F.mul(out, a[i])
    return out


def _quotient_fn(data: CircuitData):
    """Build (once per circuit) the jitted quotient evaluator."""
    import jax

    return jax.jit(quotient_run(data))


def quotient_run(data: CircuitData):
    """Traceable quotient-evaluation body (shared with the fused prover)."""
    import jax
    import jax.numpy as jnp

    cfg = data.config
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    qdf = cfg.max_quotient_degree_factor
    npp = num_partial_products(nr, qdf)
    rate = 1 << cfg.rate_bits
    n = data.n
    m = n * rate
    nconst = data.const_cols.shape[0]
    nsel = data.num_selectors
    from .builder import coset_shifts

    ks = [int(k) for k in coset_shifts(nr)]

    from .gates import DeviceBatchCtx, _brow

    ks_arr = np.array(ks, dtype=np.uint64)

    def run(wires_lde, consts_lde, zs_pp_lde, alphas, betas, gammas, pi_hash, xs, l1, inv_zh, inv_shift_pows):
        wires_stack = wires_lde[: cfg.num_wires]
        constants_vals = [consts_lde[k] for k in range(nconst)]
        ctx = DeviceBatchCtx(wires_stack, constants_vals, pi_hash)

        # gate constraints, selector-masked, stacked (K_gates, m)
        parts = []
        for s, gate in enumerate(data.gate_types):
            cons = gate.eval_batched(ctx)  # (k, m)
            sel = consts_lde[nconst + s]
            parts.append(gl.mul(cons, _brow(sel, cons.lo.shape)))

        # permutation constraints (vectorised): per challenge
        routed = wires_lde[:nr]  # (nr, m)
        sigma = GF(
            consts_lde.lo[nconst + nsel : nconst + nsel + nr],
            consts_lde.hi[nconst + nsel : nconst + nsel + nr],
        )
        kvec = gl.from_u64(ks_arr)
        ids = gl.mul(
            GF(jnp.broadcast_to(kvec.lo[:, None], (nr, m)), jnp.broadcast_to(kvec.hi[:, None], (nr, m))),
            _brow(xs, (nr, m)),
        )
        # ceil-divide: the final permutation chunk may be ragged (e.g. the
        # canonical ZK profile routed=60, qdf=8 — reference
        # common/src/circuit.rs:396-410); pad factors with multiplicative
        # ones so the segment products match host permutation_chunks().
        nchunks = -(-nr // qdf)
        pad = nchunks * qdf - nr
        for c in range(nc):
            beta = _b(alphas_like(alphas, betas, c), (nr, m))
            gamma = _b(alphas_like(alphas, gammas, c), (nr, m))
            z = zs_pp_lde[c]
            z_next = GF(jnp.roll(z.lo, -rate, axis=0), jnp.roll(z.hi, -rate, axis=0))
            num = gl.add(gl.add(routed, gl.mul(beta, ids)), gamma)
            den = gl.add(gl.add(routed, gl.mul(beta, sigma)), gamma)
            if pad:
                ones_pad = gl.ones((pad, m))
                num = gl.concat([num, ones_pad], axis=0)
                den = gl.concat([den, ones_pad], axis=0)
            cn = _segment_prod(num.reshape(nchunks, qdf, m))  # (nchunks, m)
            cd = _segment_prod(den.reshape(nchunks, qdf, m))
            pp_rows = [zs_pp_lde[nc + c * npp + j] for j in range(npp)]
            prevs = gl.stack([z] + pp_rows, axis=0)  # (nchunks, m)
            nxts = gl.stack(pp_rows + [z_next], axis=0)
            rel = gl.sub(gl.mul(nxts, cd), gl.mul(prevs, cn))
            boundary = gl.mul(l1, gl.sub(z, gl.ones(z.lo.shape)))
            parts.append(boundary.reshape(1, m))
            parts.append(rel)

        all_cons = gl.concat(parts, axis=0)  # (K, m)
        k_total = all_cons.lo.shape[0]

        # per-challenge alpha powers via scan, weighted sum via tree
        out_chunks = []
        for c in range(nc):
            def pow_body(carry, _):
                return gl.mul(carry, alphas[c]), carry

            _, apows = jax.lax.scan(pow_body, gl.ones(()), None, length=k_total)
            apows_b = GF(
                jnp.broadcast_to(apows.lo[:, None], (k_total, m)),
                jnp.broadcast_to(apows.hi[:, None], (k_total, m)),
            )
            acc = gl.sum_tree(gl.mul(all_cons, apows_b), axis=0)[0]
            t_evals = gl.mul(acc, inv_zh)
            t_coeffs = ntt.intt_j(t_evals)
            t_coeffs = gl.mul(t_coeffs, inv_shift_pows)
            out_chunks.append(t_coeffs.reshape(rate, n))
        return gl.concat(out_chunks, axis=0)  # (nc*qdf, n) — qdf == rate

    def _b(a: GF, shape):
        return GF(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))

    def alphas_like(_, vec, c):
        return vec[c]

    def _segment_prod(a: GF) -> GF:
        # product over axis 1 via log-tree halving
        while a.lo.shape[1] > 1:
            half = a.lo.shape[1] // 2
            a = gl.mul(a[:, :half], a[:, half : 2 * half])
        return GF(a.lo[:, 0], a.hi[:, 0])

    return run


#: circuits up to this degree use the fused single-graph prover by default;
#: larger circuits (the recursive aggregation layers) default to the staged
#: pipeline UNLESS warmed up — the fused graph of a degree-2^17 recursion
#: circuit costs ~16 min of one-shot XLA compile (persisted in .jax_cache),
#: after which fused proves are 17-64x faster than staged (AGG_BENCH.json:
#: 346 s -> 20.5 s private batch, 249 s -> 3.9 s public batch). Production
#: services call `warmup_fused` at startup (reference services likewise
#: build circuits at startup, `aggregator.rs:23-63`).
FUSED_DEGREE_BITS_MAX = 11


def warmup_fused(data: CircuitData, rng_mode: str = "device", mesh=None) -> None:
    """Build + compile the fused single-graph prover for `data` and flip
    subsequent `prove()` calls onto it (prove() prefers fused once the graph
    exists). Runs one zero-witness execution so the XLA compile (or the
    persistent-cache load) happens HERE, not on the first real prove.

    For ZK circuits the default `rng_mode='device'` compiles the device-rng
    variant: blinding rows + oracle salts are generated in-graph from a
    threefry key, so a prove ships only the witness values (O(100x) smaller
    upload for the canonical private batch). Pass 'host' for the
    staged-bit-identical graph instead.

    When QZKT_AOT_CACHE is set, the COMPILED executable is loaded from /
    saved to that directory (`plonk/aot_cache.py`), skipping Python tracing
    + StableHLO lowering entirely on a hit — the dominant warm-start cost
    for the canonical aggregation graphs (r3: ~900-1100 s even with a warm
    XLA cache)."""
    import jax
    import jax.numpy as jnp

    from . import aot_cache
    from .builder import witness_scatter_tables
    from .prover_fused import _build_fused

    cfg = data.config
    dev = cfg.zero_knowledge and rng_mode == "device"
    slot = ("_fused_dev" if dev else "_fused") + ("_tp" if mesh is not None else "")
    cache = data.__dict__.get(slot)
    if cache is None:
        cache = _build_fused(data, device_rng=dev, mesh=mesh)
        data.__dict__[slot] = cache
    fused_jit, layout, bundle, meta = cache
    if cfg.zero_knowledge and not dev:
        in_len = cfg.num_wires * data.n + 4 + 3 * meta["m"] * meta["n_salt"]
    else:
        in_len = len(witness_scatter_tables(data)[0]) + 4
    flat2 = jnp.zeros((in_len, 2), jnp.uint32)
    key_args = (jax.random.PRNGKey(0),) if dev else ()

    if mesh is not None or not hasattr(fused_jit, "lower"):
        # mesh graphs skip the AOT cache (single-device executable
        # serialization only); already-compiled slots just touch the graph
        jax.block_until_ready(fused_jit(flat2, bundle, *key_args))
        return

    import os as _os

    _dbg = _os.environ.get("QZKT_AOT_DEBUG")
    compiled = None
    akey = aot_cache.entry_key(data, dev)
    hit = aot_cache.load(akey)
    if hit is None and _dbg:
        print(f"[aot] MISS key={akey[:12]} (no/invalid entry)", flush=True)
    if hit is not None:
        compiled, saved_layout = hit
        layout.clear()
        layout.extend(saved_layout)
        try:  # execution is the self-check (the CPU PJRT backend can
            # deserialize an executable it then cannot run)
            jax.block_until_ready(compiled(flat2, bundle, *key_args))
            if _dbg:
                print(f"[aot] HIT key={akey[:12]} (loaded + executed)", flush=True)
        except Exception as e:
            if _dbg:
                print(f"[aot] LOAD-FAIL key={akey[:12]}: {e!r}"[:300], flush=True)
            compiled = None
    if compiled is None:
        # trace/lower/compile explicitly so the executable can be
        # serialized; tracing populates `layout` as a side effect
        compiled = fused_jit.lower(flat2, bundle, *key_args).compile()
        aot_cache.save(akey, compiled, layout)
        jax.block_until_ready(compiled(flat2, bundle, *key_args))
    data.__dict__[slot] = (compiled, layout, bundle, meta)


def prove(
    data: CircuitData,
    pw: PartialWitness,
    seed: int | None = None,
    rng_mode: str = "auto",
) -> Proof:
    """Prove. Small circuits (the leaf class) default to the fully-fused
    single-graph device prover (`prover_fused.prove_fused`, one device->host
    transfer per proof); large recursive circuits default to the staged
    multi-dispatch pipeline (bit-identical output; far cheaper compiles).
    Overrides: QZKT_STAGED_PROVER=1 forces staged, QZKT_FORCE_FUSED=1 forces
    fused.

    `rng_mode` (ZK circuits only) selects where blinding rows / oracle salts
    are drawn: 'host' is bit-identical to the staged prover for the same
    seed; 'device' draws them in-graph (smaller upload, different — but
    equally valid — proof bytes). The default 'auto' picks 'device' iff
    `warmup_fused(..., rng_mode='device')` built that graph, so
    (data, pw, seed) -> proof bytes is only reproducible for a FIXED
    rng_mode — pass it explicitly when byte-determinism across processes
    matters (ADVICE r3)."""
    import os

    use_fused = not os.environ.get("QZKT_STAGED_PROVER") and (
        data.degree_bits <= FUSED_DEGREE_BITS_MAX
        or os.environ.get("QZKT_FORCE_FUSED")
        or "_fused" in data.__dict__  # graph already built/compiled
        or "_fused_dev" in data.__dict__  # device-rng graph (warmup_fused)
    )
    if use_fused:
        from .prover_fused import prove_fused

        return prove_fused(data, pw, seed, rng_mode=rng_mode)
    if rng_mode == "device":
        # the staged pipeline has no in-graph rng; silently returning a
        # host-rng proof would break the caller's documented upload-size /
        # byte-determinism expectations (ADVICE r4)
        raise ValueError(
            "rng_mode='device' requires the fused prover, but the staged "
            "prover was selected (large circuit or QZKT_STAGED_PROVER=1); "
            "pass rng_mode='host'/'auto' or force fused (QZKT_FORCE_FUSED=1)"
        )
    return prove_staged(data, pw, seed)


def prove_batch(data: CircuitData, pws: list, seed: int | None = None) -> list:
    """Prove K independent witnesses of the same circuit in ONE device
    round-trip (vmapped fused graph — the TPU mapping of the reference's
    embarrassingly-parallel batch proving, SURVEY §2.3). Falls back to
    sequential staged proving under QZKT_STAGED_PROVER=1."""
    import os

    if not os.environ.get("QZKT_STAGED_PROVER"):
        from .prover_fused import prove_fused_batch

        return prove_fused_batch(data, pws, seed)
    rng = np.random.default_rng(seed)
    return [
        prove_staged(data, pw, seed=int(rng.integers(0, 2**63))) for pw in pws
    ]


def prove_staged(
    data: CircuitData, pw: PartialWitness, seed: int | None = None,
    mesh=None, mesh_axis: str = "cols",
) -> Proof:
    """Staged prover. With `mesh`, the three oracle commitments — the
    memory/bandwidth crux of a big circuit (SURVEY §5.8) — run
    tensor-parallel over `mesh[mesh_axis]` (`parallel/tp.commit_sharded`:
    per-device column NTTs, one all_to_all transpose, local subtree builds);
    proofs are byte-identical to the single-device path (pinned in
    tests/test_sharding.py)."""
    cfg = data.config
    n = data.n
    rate_bits = cfg.rate_bits
    cap_h = cfg.fri_config.cap_height
    assert cfg.max_quotient_degree_factor == (1 << rate_bits), (
        "quotient evaluation reuses the rate-blowup LDE domain; qdf must equal 2^rate_bits"
    )
    rng = np.random.default_rng(seed)

    if mesh is not None:
        import functools

        from ..parallel.tp import commit_sharded

        commit = functools.partial(commit_sharded, mesh=mesh, axis=mesh_axis)
    else:
        commit = fo.commit

    # 1. witness
    trace, pis = generate_witness(data, pw, rng)
    pi_hash = ps.hash_no_pad(pis)

    # 2. wires commitment (trace stays on device: iNTT + LDE fused)
    wires_o = commit(
        trace, rate_bits=rate_bits, cap_height=cap_h, blinding=cfg.zero_knowledge,
        salt_seed=int(rng.integers(0, 2**63)), from_values=True,
    )

    ch = ts.Challenger()
    ch.observe_many(data.circuit_digest)
    ch.observe_many(pi_hash)
    ch.observe_cap(wires_o.cap)
    betas = ch.challenge_many(cfg.num_challenges)
    gammas = ch.challenge_many(cfg.num_challenges)

    # 3. permutation argument
    zpp = compute_permutation_polys(data, trace, betas, gammas)
    zs_pp_o = commit(
        zpp, rate_bits=rate_bits, cap_height=cap_h, blinding=cfg.zero_knowledge,
        salt_seed=int(rng.integers(0, 2**63)), from_values=True,
    )
    ch.observe_cap(zs_pp_o.cap)
    alphas = ch.challenge_many(cfg.num_challenges)

    # 4. quotient
    if data.__dict__.get("_quot_jit") is None:
        data.__dict__["_quot_jit"] = _quotient_fn(data)
    m = n << rate_bits
    xs_host = F.mul(
        F.powers_table(F.primitive_root_of_unity(data.degree_bits + rate_bits), m),
        F.MULTIPLICATIVE_GROUP_GENERATOR,
    )
    l1_host, inv_zh_host = _l1_and_inv_zh(data, xs_host)
    inv_shift_pows = F.powers_table(F.inv(F.MULTIPLICATIVE_GROUP_GENERATOR), m)
    t_chunks = data.__dict__["_quot_jit"](
        wires_o.lde,
        data.constants_oracle.lde,
        zs_pp_o.lde,
        gl.from_u64(np.asarray(alphas)),
        gl.from_u64(np.asarray(betas)),
        gl.from_u64(np.asarray(gammas)),
        gl.from_u64(pi_hash),
        gl.from_u64(xs_host),
        gl.from_u64(l1_host),
        gl.from_u64(inv_zh_host),
        gl.from_u64(inv_shift_pows),
    )
    quotient_o = commit(
        t_chunks, rate_bits=rate_bits, cap_height=cap_h,
        blinding=cfg.zero_knowledge, salt_seed=int(rng.integers(0, 2**63)),
    )
    ch.observe_cap(quotient_o.cap)
    zeta = ch.challenge_ext()
    g_n = F.primitive_root_of_unity(data.degree_bits)
    zeta_next = ext.scalar_mul(zeta.reshape(1, 2), g_n)[0]

    # 5. openings — all oracles at zeta (+ Z cols at g*zeta), one device call
    nconst = data.const_cols.shape[0]
    nsel = data.num_selectors
    nz, npp_total = zs_pp_layout(cfg)
    (consts_open, wires_open, zpp_open, quot_open), zs_next_open = fo.eval_openings(
        [data.constants_oracle, wires_o, zs_pp_o, quotient_o],
        zeta,
        zeta_next,
        next_oracle=2,
        next_count=nz,
    )
    openings = OpeningSet(
        constants=consts_open[:nconst],
        selectors=consts_open[nconst : nconst + nsel],
        sigmas=consts_open[nconst + nsel :],
        wires=wires_open,
        zs=zpp_open[:nz],
        zs_next=zs_next_open,
        pps=zpp_open[nz:],
        quotient=quot_open,
    )
    openings.observe_into(ch)

    # 6. FRI
    instance = fri_instance(data, zeta, zeta_next)
    fri_openings = [openings.batch_zeta(), openings.batch_zeta_next()]
    oracles = [data.constants_oracle, wires_o, zs_pp_o, quotient_o]
    fri_proof = fri_prove(
        oracles, instance, fri_openings, ch, cfg.fri_config, data.degree_bits
    )
    return Proof(
        wires_cap=wires_o.cap,
        zs_pp_cap=zs_pp_o.cap,
        quotient_cap=quotient_o.cap,
        openings=openings,
        fri_proof=fri_proof,
        public_inputs=pis,
    )


def _l1_and_inv_zh(data: CircuitData, xs: np.ndarray):
    """L_1(x) = (x^n - 1) / (n (x - 1)) and 1/Z_H(x) over the LDE coset."""
    n = data.n
    xn = F.pow_scalar(xs, n)
    zh = F.sub(xn, np.uint64(1))
    inv_zh = F.inv(zh)
    denom = F.mul(np.uint64(n), F.sub(xs, np.uint64(1)))
    l1 = F.mul(zh, F.inv(denom))
    return l1, inv_zh


import functools


@functools.cache
def _intt_dev():
    import jax

    return jax.jit(ntt.intt_j)


def verify_vanishing_at_zeta(data, openings: OpeningSet, pi_hash, alphas, betas, gammas, zeta):
    """Host check: alpha-combined constraints at zeta == Z_H(zeta)*t(zeta).

    Fast path: the recorded constraint tape evaluated in one compiled call
    (plonk/constraint_tape.py — mechanically derived from the SAME shared
    definitions). The pure-Python walk below remains the differential oracle."""
    from ..hash.poseidon2 import _native

    nat = _native()
    if nat is not None:
        return _verify_vanishing_taped(data, openings, pi_hash, alphas, betas, gammas, zeta, nat)
    return _verify_vanishing_pure(data, openings, pi_hash, alphas, betas, gammas, zeta)


def _verify_vanishing_taped(data, openings, pi_hash, alphas, betas, gammas, zeta, nat):
    from ..field import extension as xt
    from .builder import coset_shifts
    from .constraint_tape import get_tape

    P = 0xFFFFFFFF00000001
    cfg = data.config
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    tape = get_tape(data)
    s = tape.slices
    inp = np.zeros((s["_total"][1], 2), dtype=np.uint64)

    def put(name, arr):
        st, cnt = s[name]
        a = np.asarray(arr, dtype=np.uint64).reshape(cnt, -1)
        if a.shape[1] == 1:  # base-field scalars embed as (v, 0)
            inp[st : st + cnt, 0] = a[:, 0]
        else:
            inp[st : st + cnt] = a

    put("wires", openings.wires)
    put("constants", openings.constants)
    put("selectors", openings.selectors)
    put("sigmas", openings.sigmas)
    put("zs", openings.zs)
    put("zs_next", openings.zs_next)
    put("pps", openings.pps)
    ks = np.asarray(coset_shifts(nr), dtype=np.uint64)
    idc = np.empty((nr, 2), dtype=np.uint64)
    idc[:, 0] = F.mul(ks, np.uint64(zeta[0]))
    idc[:, 1] = F.mul(ks, np.uint64(zeta[1]))
    put("id_coords", idc)

    zeta_t = xt.pair(zeta)
    one = (1, 0)
    n = data.n
    zeta_n, base, e = one, zeta_t, n
    while e:
        if e & 1:
            zeta_n = xt.mul(zeta_n, base)
        base = xt.mul(base, base)
        e >>= 1
    zh = xt.sub(zeta_n, one)
    l1 = xt.mul(zh, xt.inv(xt.scalar_mul(xt.sub(zeta_t, one), n)))
    put("l1", np.array([l1], dtype=np.uint64))
    put("betas", np.asarray(betas, dtype=np.uint64))
    put("gammas", np.asarray(gammas, dtype=np.uint64))
    put("alphas", np.asarray(alphas, dtype=np.uint64))
    put("pi_hash", np.asarray(pi_hash, dtype=np.uint64)[:4])

    acc = nat.eval_tape(tape, inp)  # (nc, 2)

    qdf = cfg.max_quotient_degree_factor
    tp = xt.pair
    for c in range(nc):
        t = (0, 0)
        zpow = one
        for j in range(qdf):
            t = xt.add(t, xt.mul(zpow, tp(openings.quotient[c * qdf + j])))
            zpow = xt.mul(zpow, zeta_n)
        if (int(acc[c, 0]), int(acc[c, 1])) != xt.mul(zh, t):
            return False
    return True


def _verify_vanishing_pure(data, openings: OpeningSet, pi_hash, alphas, betas, gammas, zeta):
    from ..field import extension as xt
    from .gates import HostExtCtx
    from .vanishing import HostExtAlg

    cfg = data.config
    nc = cfg.num_challenges
    nr = cfg.num_routed_wires
    alg = HostExtAlg()
    # scalar host verification runs in the (int, int) tuple domain — pure
    # Python-int arithmetic through the SAME shared ext ops / constraint
    # definitions (the three-algebra invariant is the ctx, not the dtype)
    tp = xt.pair
    wires = [tp(openings.wires[i]) for i in range(cfg.num_wires)]
    constants_vals = [tp(openings.constants[k]) for k in range(openings.constants.shape[0])]
    selector_vals = [tp(openings.selectors[s]) for s in range(data.num_selectors)]
    sigma_vals = [tp(openings.sigmas[i]) for i in range(nr)]
    zs = [tp(openings.zs[c]) for c in range(nc)]
    zs_next = [tp(openings.zs_next[c]) for c in range(nc)]
    npp = num_partial_products(nr, cfg.max_quotient_degree_factor)
    pps = [[tp(openings.pps[c * npp + j]) for j in range(npp)] for c in range(nc)]
    from .builder import coset_shifts

    P = 0xFFFFFFFF00000001
    zeta_t = tp(zeta)
    ks = coset_shifts(nr)
    id_coords = [xt.scalar_mul(zeta_t, int(k)) for k in ks]
    n = data.n
    zeta_n = zeta_t
    e = n
    acc_p = (1, 0)
    base = zeta_t
    while e:
        if e & 1:
            acc_p = xt.mul(acc_p, base)
        base = xt.mul(base, base)
        e >>= 1
    zeta_n = acc_p
    one = (1, 0)
    zh = xt.sub(zeta_n, one)
    l1 = xt.mul(zh, xt.inv(xt.scalar_mul(xt.sub(zeta_t, one), n)))
    ctx = HostExtCtx(wires, constants_vals, [(int(pi_hash[i]), 0) for i in range(4)])
    betas_e = [(int(b), 0) for b in betas]
    gammas_e = [(int(g), 0) for g in gammas]
    constraints = eval_constraints(
        ctx, data, wires, constants_vals, selector_vals, sigma_vals,
        zs, zs_next, pps, id_coords, l1, betas_e, gammas_e, alg,
    )
    qdf = cfg.max_quotient_degree_factor
    ok = True
    for c in range(nc):
        acc = (0, 0)
        apow = one
        alpha_e = (int(alphas[c]), 0)
        for cons in constraints:
            acc = xt.add(acc, xt.mul(apow, cons))
            apow = xt.mul(apow, alpha_e)
        # t_c(zeta) = sum_j zeta^{n j} t_{c,j}(zeta)
        t = (0, 0)
        zpow = one
        for j in range(qdf):
            t = xt.add(t, xt.mul(zpow, tp(openings.quotient[c * qdf + j])))
            zpow = xt.mul(zpow, zeta_n)
        if acc != xt.mul(zh, t):
            ok = False
    return ok


def pi_hash_ext(pi_hash, i):
    return np.array([pi_hash[i], 0], dtype=np.uint64)
