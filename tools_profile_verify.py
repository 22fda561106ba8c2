"""Profile host verify on the real Wormhole leaf (warm cache required).

Usage: python tools_profile_verify.py [n_iters]
Prints cProfile top-30 by cumulative time for verifier.verify(proof).
"""
import cProfile
import io
import os
import pstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from qp_zk_circuits_tpu.wormhole import test_helpers as th
from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import pickle

    # repo-local (gitignored), format-versioned cache — never a world-writable
    # /tmp path (arbitrary-code-execution via planted pickle, ADVICE r2); any
    # unpickling/shape error is a cache miss that regenerates
    FIXTURE_FORMAT = 2
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f".leaf_proof_fixture_v{FIXTURE_FORMAT}.pkl",
    )
    data = proof = None
    if os.path.exists(fixture):
        try:
            with open(fixture, "rb") as f:
                fmt, data, proof = pickle.load(f)
            if fmt != FIXTURE_FORMAT:
                data = proof = None
        except Exception:
            data = proof = None
    if proof is not None:
        verifier = WormholeVerifier(data)
        try:
            verifier.verify(proof)
        except Exception:
            data = proof = None  # stale fixture from an older proof format
    if proof is None:
        prover = WormholeProver()
        inputs0, _ = th.two_real_leaves_same_block()
        data = prover.data
        verifier = WormholeVerifier(data)
        proof = prover.prove_inputs(inputs0, seed=0)
        try:
            with open(fixture, "wb") as f:
                pickle.dump((FIXTURE_FORMAT, data, proof), f)
        except Exception as e:
            print(f"(fixture not saved: {e})")
    verifier.verify(proof)  # warm

    t0 = time.perf_counter()
    for _ in range(n):
        verifier.verify(proof)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"verify: {ms:.3f} ms/iter over {n} iters")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(n):
        verifier.verify(proof)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
