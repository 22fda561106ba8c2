"""Trusted-CI artifact generation CLI.

Port of reference `wormhole/circuit-builder/src/main.rs`: clap-style flags
with parse-time validation, atomic staged publication (the heavy lifting
lives in `wormhole/artifacts.py`)."""

from __future__ import annotations

import argparse
import sys

from ..wormhole import inputs as wi


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="circuit-builder",
        description="Generate the canonical Wormhole circuit artifact set (atomic publish).",
    )
    ap.add_argument(
        "--num-leaf-proofs", type=int, default=8,
        help=f"leaf proofs per private batch (1..={wi.MAX_PROOF_COUNT})",
    )
    ap.add_argument(
        "--num-private-batch-proofs", type=int, default=None,
        help=f"private batches per public batch (1..={wi.MAX_PROOF_COUNT})",
    )
    ap.add_argument("--output", required=True, help="target artifact directory")
    ap.add_argument(
        "--skip-prover", action="store_true",
        help="(compat) prover data is never serialized in this framework",
    )
    ap.add_argument(
        "--include-aggregation", action="store_true",
        help="also generate aggregation-layer artifacts",
    )
    return ap


def main(argv=None) -> int:
    ap = build_parser()
    args = ap.parse_args(argv)
    try:
        wi.validate_proof_count(args.num_leaf_proofs, "--num-leaf-proofs")
        if args.num_private_batch_proofs is not None:
            wi.validate_proof_count(args.num_private_batch_proofs, "--num-private-batch-proofs")
    except wi.InputsError as e:
        ap.error(str(e))

    from ..wormhole.artifacts import generate_all_circuit_binaries

    generate_all_circuit_binaries(
        args.output,
        num_leaf_proofs=args.num_leaf_proofs,
        num_private_batch_proofs=args.num_private_batch_proofs,
        include_aggregation=args.include_aggregation,
    )
    print(f"artifact set published to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
