"""Profile the canonical private-batch aggregate: where do the 346 s go?

Usage: python tools_profile_agg.py [--n-leaf 8]
Prints phase wall times + cProfile top-40 (cumulative) of the aggregate call.
"""

import argparse
import cProfile
import io
import os
import pstats
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-leaf", type=int, default=8)
    args = ap.parse_args()
    n = args.n_leaf

    from qp_zk_circuits_tpu.plonk.serialization import VerifierCircuitData
    from qp_zk_circuits_tpu.wormhole import test_helpers as th
    from qp_zk_circuits_tpu.wormhole.dummy_proof import generate_dummy_proof
    from qp_zk_circuits_tpu.wormhole.private_batch import (
        PrivateBatchCircuit,
        PrivateBatchProver,
    )
    from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
    from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

    t0 = time.perf_counter()
    leaf_prover = WormholeProver()
    print(f"[{time.perf_counter()-t0:7.1f}s] leaf circuit built")

    inputs = th.n_real_leaves_same_block(16)  # batch-16 graph is warm
    t0 = time.perf_counter()
    proofs = leaf_prover.prove_inputs_stream(inputs, batch=16, seed=0)[:n]
    print(f"[{time.perf_counter()-t0:7.1f}s] {n} leaf proofs (fused stream)")

    common = VerifierCircuitData.from_circuit_data(leaf_prover.data)
    t0 = time.perf_counter()
    agg_circuit = PrivateBatchCircuit(common, n)
    print(f"[{time.perf_counter()-t0:7.1f}s] private-batch circuit built")
    dummy = generate_dummy_proof(leaf_prover, seed=0)
    agg_prover = PrivateBatchProver(
        agg_circuit, WormholeVerifier(leaf_prover.data), dummy
    )

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    agg = agg_prover.aggregate(proofs, seed=0, rng=np.random.default_rng(0))
    pr.disable()
    total = time.perf_counter() - t0
    print(f"[{total:7.1f}s] aggregate (private-batch prove)")

    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
