"""Host-only profile of private-batch witness generation (no JAX, no device).

Builds the canonical N-leaf private-batch circuit SHAPE-ONLY, fills its proof
targets from shape-correct fake leaf proofs, and cProfiles
`generate_witness` — the host cost that survives once proving is fused.

Usage: python tools_profile_witness.py [--n-leaf 8]
"""

import argparse
import cProfile
import io
import os
import pstats
import time

import numpy as np

# fake proofs are shape-correct but value-garbage; keep-first on conflicts
# (timing is unaffected: same replay program, same action count). Lenient
# mode is an explicit API call, not an env var (ADVICE r3).
from qp_zk_circuits_tpu.plonk.builder import enable_lenient_witness_for_profiling

enable_lenient_witness_for_profiling()


def fake_proof(vd):
    """Shape-correct Proof for a circuit described by VerifierCircuitData
    (values arbitrary small felts — generators run fine on garbage)."""
    from qp_zk_circuits_tpu.fri.config import SALT_SIZE
    from qp_zk_circuits_tpu.fri.prover import FriProof, FriQueryRound, FriQueryStep
    from qp_zk_circuits_tpu.plonk.proof import OpeningSet, Proof, zs_pp_layout

    cfg = vd.config
    fcfg = cfg.fri_config
    rng = np.random.default_rng(7)

    def felts(*shape):
        return rng.integers(1, 1 << 30, size=shape, dtype=np.uint64)

    cap_shape = (1 << fcfg.cap_height, 4)
    nz, npp_total = zs_pp_layout(cfg)
    lde_bits = vd.degree_bits + fcfg.rate_bits
    salt = SALT_SIZE if cfg.zero_knowledge else 0
    widths = [
        vd.num_preprocessed,
        cfg.num_wires + salt,
        nz + npp_total + salt,
        cfg.num_challenges * cfg.max_quotient_degree_factor + salt,
    ]
    init_sib_len = lde_bits - fcfg.cap_height
    schedule = fcfg.reduction_strategy.schedule(vd.degree_bits)

    step_shapes = []
    log_m = lde_bits
    for a_bits in schedule:
        mp_bits = log_m - a_bits
        l_cap = min(fcfg.cap_height, mp_bits)
        step_shapes.append(((1 << a_bits, 2), mp_bits - l_cap, (1 << l_cap, 4)))
        log_m = mp_bits
    final_len = min(
        1 << fcfg.reduction_strategy.final_poly_bits,
        1 << (vd.degree_bits - sum(schedule)),
    )

    openings = OpeningSet(
        constants=felts(vd.num_const_cols, 2),
        selectors=felts(vd.num_selectors, 2),
        sigmas=felts(cfg.num_routed_wires, 2),
        wires=felts(cfg.num_wires, 2),
        zs=felts(nz, 2),
        zs_next=felts(nz, 2),
        pps=felts(npp_total, 2),
        quotient=felts(cfg.num_challenges * cfg.max_quotient_degree_factor, 2),
    )
    query_rounds = [
        FriQueryRound(
            initial_rows=[felts(w) for w in widths],
            initial_siblings=[felts(init_sib_len, 4) for _ in widths],
            steps=[
                FriQueryStep(leaf_values=felts(*leaf_sh), siblings=felts(sl, 4))
                for (leaf_sh, sl, _) in step_shapes
            ],
        )
        for _ in range(fcfg.num_query_rounds)
    ]
    fri_proof = FriProof(
        commit_caps=[felts(*cs) for (_, _, cs) in step_shapes],
        final_poly=felts(final_len, 2),
        pow_witness=np.uint64(12345),
        query_rounds=query_rounds,
    )
    return Proof(
        wires_cap=felts(*cap_shape),
        zs_pp_cap=felts(*cap_shape),
        quotient_cap=felts(*cap_shape),
        openings=openings,
        fri_proof=fri_proof,
        public_inputs=felts(vd.num_public_inputs),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-leaf", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    n = args.n_leaf

    from qp_zk_circuits_tpu.plonk.builder import PartialWitness, generate_witness
    from qp_zk_circuits_tpu.tools.profile_circuits import fake_leaf_verifier_data
    from qp_zk_circuits_tpu.wormhole.private_batch import PrivateBatchCircuit

    t0 = time.perf_counter()
    leaf_vd = fake_leaf_verifier_data()
    c = PrivateBatchCircuit(leaf_vd, n, shape_only=True)
    print(f"[{time.perf_counter()-t0:7.1f}s] circuit built (shape-only), "
          f"degree_bits={c.data.degree_bits} rows={c.data.num_rows_used}")

    t0 = time.perf_counter()
    pw = PartialWitness()
    proof = fake_proof(leaf_vd)
    for pt in c.proof_targets:
        from qp_zk_circuits_tpu.recursion.verifier_gadget import fill_proof_targets

        fill_proof_targets(pw, pt, proof)
    for pre_t in c.dummy_preimages:
        pw.set_many(pre_t, np.arange(4, dtype=np.uint64) + 3)
    print(f"[{time.perf_counter()-t0:7.1f}s] proof targets filled ({len(pw.values)} values)")

    # cold: records the replay program
    t0 = time.perf_counter()
    generate_witness(c.data, pw, np.random.default_rng(0))
    print(f"[{time.perf_counter()-t0:7.1f}s] generate_witness COLD (records program)")

    # warm: linear replay (the steady-state cost)
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    generate_witness(c.data, pw, np.random.default_rng(0))
    pr.disable()
    print(f"[{time.perf_counter()-t0:7.1f}s] generate_witness WARM (replay)")

    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(args.top)
    print(s.getvalue())


if __name__ == "__main__":
    main()
