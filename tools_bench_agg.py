#!/usr/bin/env python
"""Aggregation-tree benchmark: canonical-profile N-leaf private batch +
public batch + pool-admission verify, recorded to AGG_BENCH.json.

Counterpart of the reference's layer-0/layer-1 benchmark tables
(`paper/main.tex:459-499`) and the pool-admission budget
(`wormhole/aggregator/src/pool.rs:141-144`). Run on the TPU host (warm
`.jax_cache` strongly recommended — cold canonical compiles take hours):

    python tools_bench_agg.py [--n-leaf 8] [--out AGG_BENCH.json]

bench.py embeds the recorded numbers (with provenance) into its JSON line.
"""

import argparse
import datetime
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-leaf", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "AGG_BENCH.json"))
    ap.add_argument("--skip-public-batch", action="store_true")
    ap.add_argument(
        "--warm",
        action="store_true",
        help="run one throwaway prove per layer first, so the recorded times "
        "are steady-state (the aggregation service compiles at startup; the "
        "reference's 5.39 s likewise excludes circuit build)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    # AOT executable cache: warm-start skips tracing/lowering/compiling
    os.environ.setdefault(
        "QZKT_AOT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache"),
    )

    import numpy as np

    from qp_zk_circuits_tpu.plonk.serialization import VerifierCircuitData
    from qp_zk_circuits_tpu.plonk.verifier import verify as plonk_verify
    from qp_zk_circuits_tpu.tools.memprof import MemorySampler
    from qp_zk_circuits_tpu.wormhole import test_helpers as th
    from qp_zk_circuits_tpu.wormhole.dummy_proof import generate_dummy_proof
    from qp_zk_circuits_tpu.wormhole.private_batch import (
        PrivateBatchCircuit,
        PrivateBatchProver,
        generate_dummy_private_batch_proof,
    )
    from qp_zk_circuits_tpu.wormhole.prover import WormholeProver
    from qp_zk_circuits_tpu.wormhole.verifier import WormholeVerifier

    n = args.n_leaf
    rec = {
        "config": "canonical-zk (135/60 wires, 28 queries x rate 3 + 16 PoW = 100 bits)",
        "n_leaf": n,
        "recorded_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "reproduce": f"python tools_bench_agg.py --n-leaf {n}"
        + (" --warm" if args.warm else ""),
        "warm": bool(args.warm),
        "prover_path": (
            "fused-forced" if os.environ.get("QZKT_FORCE_FUSED")
            else "fused-warm-start" if args.warm
            else "auto"
        ),
    }

    sampler = MemorySampler()
    with sampler:
        t0 = time.perf_counter()
        leaf_prover = WormholeProver()
        rec["leaf_build_s"] = round(time.perf_counter() - t0, 3)

        inputs = th.n_real_leaves_same_block(n)
        if args.warm:
            leaf_prover.prove_inputs(inputs[0], seed=999)  # compile/cache-load
        t0 = time.perf_counter()
        proofs = [leaf_prover.prove_inputs(inputs[k], seed=k) for k in range(n)]
        rec["leaf_prove_total_s"] = round(time.perf_counter() - t0, 3)
        rec["leaf_prove_ms_each"] = round(rec["leaf_prove_total_s"] / n * 1000, 1)

        common = VerifierCircuitData.from_circuit_data(leaf_prover.data)
        t0 = time.perf_counter()
        agg_circuit = PrivateBatchCircuit(common, n)
        rec["private_batch_build_s"] = round(time.perf_counter() - t0, 3)
        dummy = generate_dummy_proof(leaf_prover, seed=0)
        t0 = time.perf_counter()
        agg_prover = PrivateBatchProver(
            agg_circuit, WormholeVerifier(leaf_prover.data), dummy,
            warm_start=args.warm,
        )
        if args.warm:
            rec["private_batch_warmup_s"] = round(time.perf_counter() - t0, 3)

        if args.warm:
            agg_prover.aggregate(proofs, seed=99, rng=np.random.default_rng(99))
        # phase-separated memory accounting (reference memprof brackets
        # phases): everything so far is build+warmup (incl. XLA compile);
        # what follows is the steady-state prove the scaling table measures
        rec["peak_mb_build_warmup"] = sampler.mark()
        t0 = time.perf_counter()
        agg = agg_prover.aggregate(proofs, seed=0, rng=np.random.default_rng(0))
        rec["private_batch_prove_s"] = round(time.perf_counter() - t0, 3)
        rec["peak_mb_private_prove"] = sampler.mark()
        timings = agg_circuit.data.__dict__.get("_last_prove_timings")
        if timings:
            rec["private_batch_phases"] = timings
        ref_n8 = {2: 1.55, 4: 2.81, 8: 5.39, 16: 10.74, 32: 21.71}.get(n)
        if ref_n8:
            rec["vs_baseline_n8"] = round(ref_n8 / rec["private_batch_prove_s"], 4)

        # pool-admission verify: what the miner pays per pushed proof
        # (reference budget ~10-20 ms, pool.rs:141-144)
        plonk_verify(agg_circuit.data, agg)  # warm/correctness
        t0 = time.perf_counter()
        for _ in range(5):
            plonk_verify(agg_circuit.data, agg)
        rec["pool_admission_verify_ms"] = round((time.perf_counter() - t0) / 5 * 1000, 2)

        if not args.skip_public_batch:
            from functools import partial

            from qp_zk_circuits_tpu.wormhole import inputs as wi
            from qp_zk_circuits_tpu.wormhole.public_batch import (
                PublicBatchCircuit,
                PublicBatchProver,
            )

            t0 = time.perf_counter()
            dummy_pb = generate_dummy_private_batch_proof(agg_circuit, dummy, seed=0)
            rec["dummy_private_batch_prove_s"] = round(time.perf_counter() - t0, 3)
            pb_common = VerifierCircuitData.from_circuit_data(agg_circuit.data)
            t0 = time.perf_counter()
            pub_circuit = PublicBatchCircuit(pb_common, 2, n)
            rec["public_batch_build_s"] = round(time.perf_counter() - t0, 3)
            pub_prover = PublicBatchProver(
                pub_circuit, partial(plonk_verify, agg_circuit.data), dummy_pb,
                warm_start=args.warm,
            )
            addr = wi.BytesDigest(bytes(range(1, 33)))
            if args.warm:
                pub_prover.commit([agg], addr).prove(seed=99)
            t0 = time.perf_counter()
            pub = pub_prover.commit([agg], addr).prove(seed=0)
            rec["public_batch_prove_s"] = round(time.perf_counter() - t0, 3)
            plonk_verify(pub_circuit.data, pub)
            t0 = time.perf_counter()
            for _ in range(5):
                plonk_verify(pub_circuit.data, pub)
            rec["public_batch_verify_ms"] = round((time.perf_counter() - t0) / 5 * 1000, 2)
    rec["peak_mb"] = max(  # overall peak across all phases
        round(sampler.peak_mb, 1),
        rec.get("peak_mb_build_warmup", 0.0),
        rec.get("peak_mb_private_prove", 0.0),
    )

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
