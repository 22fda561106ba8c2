#!/usr/bin/env python
"""Benchmark: Wormhole leaf prove end-to-end on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference Rust prover's leaf prove ≈ 20 ms on an Apple M2 Max
(BASELINE.md; paper/main.tex:455). vs_baseline = baseline_ms / ours_ms
(>1 means faster than the reference)."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # use the real TPU when present

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from qp_zk_circuits_tpu.wormhole import test_helpers as th
    from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
    from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

    prover = WormholeProver()
    inputs0, inputs1 = th.two_real_leaves_same_block()

    # warmup: compile everything
    proof = prover.prove_inputs(inputs0, seed=0)
    WormholeVerifier(prover.data).verify(proof)

    # timed runs (alternate fixtures so witness generation is honest work)
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        prover.prove_inputs(inputs0 if i % 2 == 0 else inputs1, seed=i)
    elapsed_ms = (time.perf_counter() - t0) / n_runs * 1000.0

    baseline_ms = 20.0
    print(
        json.dumps(
            {
                "metric": "leaf_prove_ms",
                "value": round(elapsed_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / elapsed_ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
