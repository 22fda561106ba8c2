#!/usr/bin/env python
"""Benchmark: Wormhole leaf prove/verify on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: sustained per-proof latency of PIPELINED BATCH leaf proving
(prove_inputs_stream) — the TPU-native deployment shape (the reference scales
leaf proving by running provers in parallel on CPU cores; here one chip
proves a whole batch per round-trip and host witness generation overlaps
device execution). Baseline: the reference's single-leaf prove ≈ 20 ms on an
Apple M2 Max (BASELINE.md; paper/main.tex:455). vs_baseline = 20 / ours
(>1 means more leaf throughput than the reference's per-core rate).

`extra` carries the secondary metrics: single-proof latency (one tunnel
round-trip floor ~65 ms on this host), host verify latency (reference
≈1.6 ms), and the batch size used.
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # use the real TPU when present

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
os.environ.setdefault(
    "QZKT_AOT_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache"),
)

BATCH = 16
ROUNDS = 3  # pipelined stream chunks per timed run


def main():
    from qp_zk_circuits_tpu.wormhole import test_helpers as th
    from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
    from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

    prover = WormholeProver()
    inputs0, inputs1 = th.two_real_leaves_same_block()
    verifier = WormholeVerifier(prover.data)

    # warmup: compile the single and batched graphs
    proof = prover.prove_inputs(inputs0, seed=0)
    verifier.verify(proof)
    stream_inputs = [inputs0 if i % 2 == 0 else inputs1 for i in range(BATCH * ROUNDS)]
    prover.prove_inputs_stream(stream_inputs, batch=BATCH, seed=0)

    # headline: sustained pipelined throughput
    t0 = time.perf_counter()
    proofs = prover.prove_inputs_stream(stream_inputs, batch=BATCH, seed=1)
    stream_ms = (time.perf_counter() - t0) / len(proofs) * 1000.0

    # secondary: single-proof latency
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        prover.prove_inputs(inputs0 if i % 2 == 0 else inputs1, seed=i)
    single_ms = (time.perf_counter() - t0) / n_runs * 1000.0

    # secondary: host verify latency (the pool-admission cost)
    t0 = time.perf_counter()
    for _ in range(n_runs):
        verifier.verify(proof)
    verify_ms = (time.perf_counter() - t0) / n_runs * 1000.0

    baseline_ms = 20.0
    extra = {
        "batch": BATCH,
        "leaf_prove_single_ms": round(single_ms, 3),
        "leaf_verify_ms": round(verify_ms, 3),
        "verify_vs_baseline": round(1.6 / verify_ms, 4),
    }
    timings = prover.data.__dict__.get("_last_prove_timings")
    if timings:
        extra["leaf_single_phases"] = timings
    # aggregation metrics: recorded by a full `memprof --canonical --json`
    # run on this host's TPU (too slow to rerun inside every bench: the
    # canonical N=8 private batch is a multi-minute prove with multi-hour
    # cold compiles). AGG_BENCH.json carries the verbatim memprof output +
    # provenance; reproduce with the command stored inside it.
    agg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AGG_BENCH.json")
    if os.path.exists(agg_path):
        try:
            with open(agg_path) as f:
                agg = json.load(f)
            extra["agg_recorded"] = {
                "private_batch_prove_s": agg.get("private_batch_prove_s"),
                "public_batch_prove_s": agg.get("public_batch_prove_s"),
                "pool_admission_verify_ms": agg.get("pool_admission_verify_ms"),
                "n_leaf": agg.get("n_leaf"),
                "config": agg.get("config"),
                "peak_mb": agg.get("peak_mb"),
                "recorded_utc": agg.get("recorded_utc"),
                "vs_baseline_n8": agg.get("vs_baseline_n8"),
                "prover_path": agg.get("prover_path"),
                "phases": agg.get("private_batch_phases"),
            }
        except Exception:
            pass
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AGG_SWEEP.json")
    if os.path.exists(sweep_path):
        try:
            with open(sweep_path) as f:
                rows = json.load(f)
            extra["agg_scaling"] = [
                {
                    "n_leaf": r.get("n_leaf"),
                    "private_batch_prove_s": r.get("private_batch_prove_s"),
                    "reference_s": r.get("reference_s"),
                }
                for r in rows
            ]
        except Exception:
            pass
    print(
        json.dumps(
            {
                "metric": "leaf_prove_stream_ms_per_proof",
                "value": round(stream_ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / stream_ms, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
