"""FRI prover: batched composition, commit/fold phase, PoW grind, queries.

Implements the low-degree opening argument consumed by the PLONK prover
(the reference hot loop "FRI commit/fold (ConstantArityBits(4,5)) -> 28 query
rounds -> 16-bit PoW", SURVEY §3.1). TPU-first layout:

  * The composition polynomial Q(X) = sum_k alpha^k (p_k(X) - y_k)/(X - z_b)
    is computed **in evaluation form over the whole LDE domain on device**:
    per opening point one weighted column-sum of the committed LDE matrices
    (VPU elementwise + log-depth adds) and one vectorised Fermat inverse of
    (x - z). No coefficient-space work, no host round-trips.
  * Arity-2^a folds run as `a` binary folds with betas beta^(2^t); each fold
    is 3 elementwise extension ops over the layer, with the inverse-twiddle
    tables cached per (layer size, shift) across proofs.
  * Commit-phase leaves regroup the layer so one query opens the whole arity
    coset: leaf q = [v[q + j*M'] for j < 2^a].

Host keeps: transcript, tree materialisation, query assembly, PoW search.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from ..field import extension as ext
from ..field import gf_np as F
from ..field import goldilocks as gl
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..hash import merkle
from ..plonk import transcript as ts
from ..poly import ntt
from .config import FriConfig
from .oracle import PolynomialBatch


# ---------------------------------------------------------------------------
# instance description


@dataclass(frozen=True)
class FriBatchInfo:
    """One opening point and the (oracle, poly) columns opened there."""

    point: tuple[int, int]  # extension point (c0, c1) as ints
    polys: tuple[tuple[int, int], ...]  # (oracle_index, poly_index)


@dataclass(frozen=True)
class FriInstance:
    batches: tuple[FriBatchInfo, ...]

    def num_terms(self) -> int:
        return sum(len(b.polys) for b in self.batches)


# ---------------------------------------------------------------------------
# proof objects


@dataclass
class FriQueryStep:
    leaf_values: np.ndarray  # (2^a, 2) extension values of the committed layer
    siblings: np.ndarray  # merkle siblings (per level, 4)


@dataclass
class FriQueryRound:
    initial_rows: list  # per oracle: np (C_total,) leaf row
    initial_siblings: list  # per oracle: np (L, 4)
    steps: list  # [FriQueryStep]


@dataclass
class FriProof:
    commit_caps: list  # per layer: np (2^cap, 4)
    final_poly: np.ndarray  # (2^final_poly_bits, 2) extension coefficients
    pow_witness: np.uint64
    query_rounds: list = field(default_factory=list)  # [FriQueryRound]


# ---------------------------------------------------------------------------
# cached host tables


@functools.cache
def _inv_x_table(log_m: int, shift_pow: int) -> np.ndarray:
    """(shift * w^i)^{-1} for i < 2^(log_m-1), with shift = g^(2^shift_pow),
    w the 2^log_m-th root of unity."""
    g = F.MULTIPLICATIVE_GROUP_GENERATOR
    shift = F.pow_scalar(g, 1 << shift_pow)
    w = F.primitive_root_of_unity(log_m)
    inv_w = F.inv(w)
    inv_shift = F.inv(shift)
    return F.mul(F.powers_table(inv_w, 1 << (log_m - 1)), inv_shift)


_INV2 = int(pow(2, 0xFFFFFFFF00000001 - 2, 0xFFFFFFFF00000001))


@functools.cache
def _get_fold_jit():
    import jax

    return jax.jit(_fold_step)


@functools.cache
def _get_regroup_jit(arity_bits: int):
    import jax

    return jax.jit(functools.partial(_regroup_leaves, arity_bits=arity_bits))


# ---------------------------------------------------------------------------
# device kernels (jitted per static shape signature)


def _fold_step(values: GF2, beta: GF2, inv_x: GF) -> GF2:
    """One binary fold: new_i = inv2 * [(e+o) + beta*inv_x_i*(e-o)]."""
    m = values.shape[0]
    e = GF2(values.c0[: m // 2], values.c1[: m // 2])
    o = GF2(values.c0[m // 2 :], values.c1[m // 2 :])
    s = ext.j_add(e, o)
    d = ext.j_sub(e, o)
    d = ext.j_scalar_mul(d, inv_x)  # (base inv_x) * ext
    d = ext.j_mul(d, _bcast2(beta, d.shape))
    out = ext.j_add(s, d)
    return GF2(gl.mul_const(out.c0, _INV2), gl.mul_const(out.c1, _INV2))


def _bcast2(a: GF2, shape) -> GF2:
    import jax.numpy as jnp

    return GF2(
        GF(jnp.broadcast_to(a.c0.lo, shape), jnp.broadcast_to(a.c0.hi, shape)),
        GF(jnp.broadcast_to(a.c1.lo, shape), jnp.broadcast_to(a.c1.hi, shape)),
    )


def _regroup_leaves(values: GF2, arity_bits: int) -> GF:
    """(m,) ext -> (m/2^a, 2^(a+1)) felts: leaf q = [v(q + j*m') for j], with
    each extension element flattened (c0, c1)."""
    import jax.numpy as jnp

    m = values.shape[0]
    a = 1 << arity_bits
    mp = m // a
    lo = jnp.stack([values.c0.lo.reshape(a, mp).T, values.c1.lo.reshape(a, mp).T], axis=-1)
    hi = jnp.stack([values.c0.hi.reshape(a, mp).T, values.c1.hi.reshape(a, mp).T], axis=-1)
    return GF(lo.reshape(mp, 2 * a), hi.reshape(mp, 2 * a))


@functools.cache
def _get_q_jit(sig: tuple):
    """Composition evaluator; `sig` = per-batch tuples of (oracle, poly)
    static indices, so the column gathers happen IN-GRAPH (no eager slicing)."""
    import jax
    import jax.numpy as jnp

    def run(oracle_ldes, apows, cbs, inv_xzs):
        q = None
        for bi, polys in enumerate(sig):
            lo = jnp.stack([oracle_ldes[oi].lo[pj] for oi, pj in polys])
            hi = jnp.stack([oracle_ldes[oi].hi[pj] for oi, pj in polys])
            cols = GF(lo, hi)
            ja, c_b, inv_xz = apows[bi], cbs[bi], inv_xzs[bi]
            # S_b(x) = sum_k alpha^k p_k(x): weighted column sum
            t0 = gl.mul(cols, _bcol(ja.c0, cols.shape))
            t1 = gl.mul(cols, _bcol(ja.c1, cols.shape))
            s_b = GF2(gl.sum_tree(t0, axis=0), gl.sum_tree(t1, axis=0))
            s_b = GF2(GF(s_b.c0.lo[0], s_b.c0.hi[0]), GF(s_b.c1.lo[0], s_b.c1.hi[0]))
            num = ext.j_sub(s_b, _bcast2(c_b, s_b.shape))
            contrib = ext.j_mul(num, inv_xz)
            q = contrib if q is None else ext.j_add(q, contrib)
        return q

    return jax.jit(run)


def compute_composition(
    oracles: list[PolynomialBatch],
    instance: FriInstance,
    openings: list[np.ndarray],
    alpha: np.ndarray,
    lde_bits: int,
) -> GF2:
    """Device evaluation of Q over the full LDE domain (natural order).

    openings: per batch, (K_b, 2) claimed values for the batch's polys."""
    m = 1 << lde_bits
    # host: domain points x_i = g * w^i (base field)
    xs = F.mul(
        F.powers_table(F.primitive_root_of_unity(lde_bits), m),
        F.MULTIPLICATIVE_GROUP_GENERATOR,
    )
    term = 0
    apows_l, cbs_l, invs_l = [], [], []
    for b_idx, batch in enumerate(instance.batches):
        k = len(batch.polys)
        apows = ext.powers_table(np.asarray(alpha, dtype=np.uint64), term + k)[term:]
        term += k
        y = np.asarray(openings[b_idx], dtype=np.uint64).reshape(k, 2)
        c_b = ext.sum_axis0(ext.mul(apows, y))
        z0, z1 = np.uint64(batch.point[0] % (1 << 64)), np.uint64(batch.point[1])
        xz = np.stack([F.sub(xs, z0), np.broadcast_to(F.neg(z1), xs.shape)], axis=-1)
        inv_xz = ext.inv(xz)  # (m, 2) — host vectorised
        apows_l.append(ext.j_from_u64(apows))
        cbs_l.append(ext.j_from_u64(c_b))
        invs_l.append(ext.j_from_u64(inv_xz))
    sig = tuple(tuple(batch.polys) for batch in instance.batches)
    return _get_q_jit(sig)(
        [o.lde for o in oracles], apows_l, cbs_l, invs_l
    )


def _bcol(a: GF, shape) -> GF:
    import jax.numpy as jnp

    return GF(
        jnp.broadcast_to(a.lo[:, None], shape), jnp.broadcast_to(a.hi[:, None], shape)
    )


# ---------------------------------------------------------------------------
# main prover entry


def fri_prove(
    oracles: list[PolynomialBatch],
    instance: FriInstance,
    openings: list[np.ndarray],
    challenger: ts.Challenger,
    config: FriConfig,
    degree_bits: int,
) -> FriProof:
    import jax

    alpha = challenger.challenge_ext()
    lde_bits = degree_bits + config.rate_bits
    m0 = 1 << lde_bits
    values = compute_composition(oracles, instance, openings, alpha, lde_bits)

    schedule = config.reduction_strategy.schedule(degree_bits)
    caps = []
    layer_trees = []
    layer_leaves_host = []
    log_m = lde_bits
    shift_pow = 0  # current coset shift is g^(2^shift_pow)

    fold_jit = _get_fold_jit()
    for a_bits in schedule:
        leaves = _get_regroup_jit(a_bits)(values)
        cap_h = min(config.cap_height, log_m - a_bits)
        tree = merkle.build_merkle_tree(leaves, cap_h)
        layer_trees.append(tree)
        layer_leaves_host.append(gl.to_u64(leaves))
        caps.append(tree.cap)
        challenger.observe_cap(tree.cap)
        beta = challenger.challenge_ext()
        beta_t = beta.copy()
        for _ in range(a_bits):
            inv_x = _inv_x_table(log_m, shift_pow)
            values = fold_jit(
                values, ext.j_from_u64(beta_t), gl.from_u64(inv_x)
            )
            beta_t = ext.mul(beta_t, beta_t)
            log_m -= 1
            shift_pow += 1

    # final polynomial: coset-iNTT of the remaining values
    final_vals = np.stack([gl.to_u64(values.c0), gl.to_u64(values.c1)], axis=-1)
    final_shift = F.pow_scalar(F.MULTIPLICATIVE_GROUP_GENERATOR, 1 << shift_pow)
    coeffs = np.stack(
        [ntt.intt_np(final_vals[:, 0]), ntt.intt_np(final_vals[:, 1])], axis=-1
    )
    inv_shift_pows = F.powers_table(F.inv(final_shift), coeffs.shape[0])
    coeffs = np.stack(
        [F.mul(coeffs[:, 0], inv_shift_pows), F.mul(coeffs[:, 1], inv_shift_pows)],
        axis=-1,
    )
    fpb = config.reduction_strategy.final_poly_bits
    # the honest degree bound after folding (may be below 2^fpb for tiny circuits)
    final_len = min(1 << fpb, 1 << (degree_bits - sum(schedule)))
    assert not np.any(coeffs[final_len:]), "final poly exceeds degree bound"
    final_poly = coeffs[:final_len]
    challenger.observe_many(final_poly)

    # proof-of-work grind
    pow_witness = ts.grind_pow(challenger, config.proof_of_work_bits)
    challenger.observe(pow_witness)
    pow_response = challenger.challenge()
    assert int(pow_response) < (1 << (64 - config.proof_of_work_bits))

    # queries
    indices = [challenger.challenge_index(m0) for _ in range(config.num_query_rounds)]
    # gather all initial rows of all oracles in ONE device call/transfer
    from .oracle import open_rows_many

    rows_per_oracle = open_rows_many(oracles, indices)
    query_rounds = []
    for qi, q0 in enumerate(indices):
        initial_rows = [rows_per_oracle[oi][qi] for oi in range(len(oracles))]
        initial_sibs = [o.tree.prove(q0) for o in oracles]
        steps = []
        q = q0
        for li, a_bits in enumerate(schedule):
            mp = layer_leaves_host[li].shape[0]
            q_next = q % mp
            leaf = layer_leaves_host[li][q_next].reshape(-1, 2)
            steps.append(
                FriQueryStep(
                    leaf_values=leaf, siblings=layer_trees[li].prove(q_next)
                )
            )
            q = q_next
        query_rounds.append(
            FriQueryRound(
                initial_rows=initial_rows, initial_siblings=initial_sibs, steps=steps
            )
        )
    return FriProof(
        commit_caps=caps,
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_rounds=query_rounds,
    )
