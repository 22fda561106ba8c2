"""Parameter-sweep report generator — counterpart of the reference's
`wormhole/memprof/sweep-results/report.md` (produced by
`scripts/sweep_and_plot.py` there).

The reference sweeps one circuit knob at a time on a CPU prover and records
peak RSS + wall time. On this TPU framework the honest equivalents are:

- **shape sweeps** (exact, host-only): rebuild the circuit per knob value
  and report degree bits / rows / column counts — the quantities that DRIVE
  memory and time (device memory is `columns x lde_size x 8 B` per oracle);
- **an analytic device-HBM estimate** per configuration from the oracle
  layout (wires+salt | Z+partial-products+salt | quotient | preprocessed);
- **measured anchors**: the recorded canonical-profile N=8 run on the real
  TPU (AGG_BENCH.json / the memprof phase log), embedded verbatim.

Security-weakening knobs are swept for *visibility* but flagged, mirroring
the reference report's "safe knobs only" policy.

    python -m qp_zk_circuits_tpu.tools.sweep_shapes --out docs/sweep-results/report.md
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
from dataclasses import replace

from ..fri.config import SALT_SIZE
from ..utils.config_policy import (
    validate_circuit_config,
    wormhole_private_batch_circuit_config,
)
from .profile_circuits import (
    SECURITY_GRID,
    aggregation_scaling,
    fake_leaf_verifier_data,
    gadget_cost_vs_leaf_fri,
    security_tradeoffs,
    wormhole_circuit_profile,
)


def estimate_device_mb(data) -> float:
    """Analytic peak-HBM estimate for proving one circuit: all committed
    oracles' LDEs resident at once (commit-phase peak), 8 B per felt, plus
    one transposed copy of the largest oracle for leaf hashing."""
    cfg = data.config
    lde = data.n << cfg.fri_config.rate_bits
    salt = SALT_SIZE if cfg.zero_knowledge else 0
    wires_cols = cfg.num_wires + salt
    zs_cols = cfg.num_challenges * 2 + salt  # Z + partial products (approx)
    quot_cols = cfg.num_challenges * cfg.max_quotient_degree_factor + salt
    pre_cols = data.num_preprocessed
    total_cols = wires_cols + zs_cols + quot_cols + pre_cols
    bytes_total = (total_cols + wires_cols) * lde * 8  # + transpose of largest
    return bytes_total / 1e6


def _pb_shape(nrw=None, nw=None, qdf=None, zk=None, n_leaf=2):
    from ..wormhole.private_batch import PrivateBatchCircuit

    cfg = wormhole_private_batch_circuit_config()
    if nrw is not None:
        cfg = replace(cfg, num_routed_wires=nrw)
    if nw is not None:
        cfg = replace(cfg, num_wires=nw)
    if qdf is not None:
        cfg = replace(cfg, max_quotient_degree_factor=qdf)
    if zk is not None:
        cfg = replace(cfg, zero_knowledge=zk)
    validate_circuit_config(cfg)
    leaf_common = fake_leaf_verifier_data()
    c = PrivateBatchCircuit(leaf_common, n_leaf, config=cfg, shape_only=True)
    return c.data


def _row(data, label) -> dict:
    return {
        "label": label,
        "degree_bits": data.degree_bits,
        "rows_used": data.num_rows_used,
        "est_device_mb": round(estimate_device_mb(data), 1),
    }


def sweep_routed_wires(values=(54, 56, 60, 65, 70, 75, 80), n_leaf=2) -> list[dict]:
    """Reference sweep: num_routed_wires on the private batch. Narrower
    routing packs fewer routed cells per row -> more rows; at some width the
    row count crosses a power of two and degree_bits jumps."""
    return [_row(_pb_shape(nrw=v, n_leaf=n_leaf), v) for v in values]


def sweep_num_wires(values=(135, 138, 140, 143)) -> list[dict]:
    """135 is the floor (Poseidon gate width). Extra wire columns only add
    advice-column memory; rows are unchanged."""
    return [_row(_pb_shape(nw=v), v) for v in values]


def sweep_qdf(values=(7, 8)) -> list[dict]:
    """max_quotient_degree_factor: 7 is the Poseidon constraint floor.
    Drives quotient-oracle column count (memory), not rows."""
    return [_row(_pb_shape(qdf=v), v) for v in values]


def sweep_zk_mode() -> list[dict]:
    """Row blinding on/off. `off` is NOT zero-knowledge — flagged, kept for
    visibility like the reference excluded `disabled` from its tables."""
    return [
        _row(_pb_shape(zk=True), "rowblinding (production)"),
        _row(_pb_shape(zk=False), "disabled (NOT ZK — excluded from recs)"),
    ]


def _md_table(rows, cols, headers) -> str:
    out = ["| " + " | ".join(headers) + " |", "|" + "|".join("---" for _ in headers) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out)


def generate_report(out_path: str, anchors: dict | None = None) -> str:
    now = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    leaf = wormhole_circuit_profile()
    sec = security_tradeoffs()
    gadget = gadget_cost_vs_leaf_fri()
    scaling = aggregation_scaling((2, 4, 8, 16))
    nrw = sweep_routed_wires()
    nw = sweep_num_wires()
    qdf = sweep_qdf()
    zk = sweep_zk_mode()

    md = [
        "# qp-zk-circuits-tpu — parameter sweep",
        "",
        f"_Generated {now} by `python -m qp_zk_circuits_tpu.tools.sweep_shapes`._",
        "",
        "Counterpart of the reference's `wormhole/memprof/sweep-results/report.md`.",
        "Shape sweeps are exact (host-only circuit builds per knob value);",
        "`est HBM (MB)` is the analytic commit-phase peak (all oracle LDEs resident,",
        "8 B/felt, + one transposed copy of the wires oracle for leaf hashing).",
        "Measured anchors from the real TPU are at the bottom. Knobs that weaken",
        "security are flagged and excluded from recommendations, as in the",
        "reference report.",
        "",
        "## Headline results",
        "",
        "1. **Leaf FRI queries are the aggregator's cost dial, not the leaf's.**",
        "   The leaf circuit's degree is flat across every 76..100-bit FRI config",
        "   (table below, same finding as the reference), but each leaf query",
        "   round adds in-circuit FRI checks to the private batch: dropping the",
        f"   leaf from 28 to 24 query rounds (100 -> 88 bits) moves the N=2 batch from",
        f"   degree {gadget[0]['pb_degree_bits']} to {gadget[1]['pb_degree_bits']}"
        " — a 2x memory/time saving per aggregation, at the cost of",
        "   12 security bits and a coordinated chain-side verifier update.",
        "2. **Wider routing is a degree bit cheaper here — the OPPOSITE of the",
        "   reference's CPU finding.** Their sweep favored narrow routing",
        "   (nrw=54) because CPU memory scales with committed columns; on this",
        "   engine the recursion gadget packs routed cells per row, so widening",
        "   60 -> 70+ drops `rows_used` below the next power of two and saves a",
        "   full degree bit (see both `num_routed_wires` tables; at N=8 the",
        "   same cliff would halve the canonical batch). Production stays at",
        "   the reference's 135/60 for chain compatibility — the knob is there.",
        "3. **ZK row blinding costs one degree bit on the leaf** "
        f"(degree {leaf['no_zk']['degree_bits']} -> {leaf['zk']['degree_bits']}),"
        " matching the reference's rowblinding-vs-polyfri finding that row",
        "   blinding is the cheap ZK mode (PolyFri is not implemented here; row",
        "   blinding is the production mode the reference settled on in #139).",
        "",
        "## Leaf circuit profiles",
        "",
        _md_table(
            [
                {"mode": "non-ZK (leaf/public-batch)", **leaf["no_zk"], "rows_by_gate": ""},
                {"mode": "ZK rowblinding (private-batch profile)", **leaf["zk"], "rows_by_gate": ""},
            ],
            ["mode", "degree_bits", "rows_used", "num_public_inputs", "num_preprocessed_columns"],
            ["mode", "degree bits", "rows used", "PIs", "preprocessed cols"],
        ),
        "",
        "## FRI security tradeoffs (leaf circuit)",
        "",
        "Same grid as the reference (`wormhole/circuit/src/profile.rs:142-156`):",
        "leaf degree is **flat** — cheaper FRI only shrinks proofs/verify time.",
        "",
        _md_table(
            sec,
            ["name", "num_query_rounds", "proof_of_work_bits", "security_bits", "degree_bits"],
            ["config", "queries", "PoW bits", "security bits", "leaf degree bits"],
        ),
        "",
        "## Leaf FRI config -> private-batch gadget cost (N=2)",
        "",
        "The downstream effect the reference's table can't show: the recursive",
        "verifier gadget's size per leaf-proof config.",
        "",
        _md_table(
            gadget,
            ["leaf_config", "num_query_rounds", "security_bits", "pb_degree_bits", "pb_rows_used"],
            ["leaf config", "queries", "security bits", "batch degree bits", "batch rows used"],
        ),
        "",
        "## Aggregation batch size (num_leaf_proofs, canonical ZK config)",
        "",
        _md_table(
            [
                {**r, "est_device_mb": _row(_pb_shape(n_leaf=r["num_leaves"]), "")["est_device_mb"]}
                for r in scaling
            ],
            ["num_leaves", "degree_bits", "rows_used", "num_public_inputs", "est_device_mb"],
            ["leaves", "degree bits", "rows used", "PI len", "est HBM (MB)"],
        ),
        "",
        "One degree bit per leaf doubling at current budgets; PI layout is 21N+8.",
        "",
        "## num_routed_wires (private batch, N=2)",
        "",
        _md_table(
            nrw,
            ["label", "degree_bits", "rows_used", "est_device_mb"],
            ["num_routed_wires", "degree bits", "rows used", "est HBM (MB)"],
        ),
        "",
        "## num_routed_wires (private batch, N=8, canonical batch size)",
        "",
        _md_table(
            sweep_routed_wires(values=(60, 70, 80), n_leaf=8),
            ["label", "degree_bits", "rows_used", "est_device_mb"],
            ["num_routed_wires", "degree bits", "rows used", "est HBM (MB)"],
        ),
        "",
        "## num_wires (private batch, N=2)",
        "",
        "135 is the Poseidon floor; extra columns buy nothing here (the",
        "reference found the same and shipped 135).",
        "",
        _md_table(
            nw,
            ["label", "degree_bits", "rows_used", "est_device_mb"],
            ["num_wires", "degree bits", "rows used", "est HBM (MB)"],
        ),
        "",
        "## max_quotient_degree_factor (private batch, N=2)",
        "",
        _md_table(
            qdf,
            ["label", "degree_bits", "rows_used", "est_device_mb"],
            ["qdf", "degree bits", "rows used", "est HBM (MB)"],
        ),
        "",
        "## ZK mode (private batch, N=2)",
        "",
        _md_table(
            zk,
            ["label", "degree_bits", "rows_used", "est_device_mb"],
            ["mode", "degree bits", "rows used", "est HBM (MB)"],
        ),
        "",
    ]

    anchors = anchors or {}
    md += ["## Measured anchors (real TPU)", ""]
    if anchors:
        for name, blob in anchors.items():
            md += [f"### {name}", "", "```json", json.dumps(blob, indent=2), "```", ""]
    else:
        md += ["_No measured anchors found (AGG_BENCH.json / BENCH_r*.json missing)._", ""]

    md += [
        "## Notes",
        "",
        "- Shape numbers are exact: every row rebuilds the circuit at that knob",
        "  value through the production builder + config validation.",
        "- `est HBM (MB)` is a commit-phase model, not a measurement; the",
        "  measured anchors carry real host-RSS peaks (the TPU device memory",
        "  is remote on this host, so RSS reflects host staging + transcripts).",
        "- Every `CircuitConfig` knob changes the circuit digest and therefore",
        "  requires a coordinated chain-side verifier update, exactly as the",
        "  reference report warns.",
    ]

    text = "\n".join(md) + "\n"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(text)
    return text


def collect_anchors(repo_root: str) -> dict:
    anchors = {}
    agg = os.path.join(repo_root, "AGG_BENCH.json")
    if os.path.exists(agg):
        with open(agg) as f:
            anchors["Canonical-profile N=8 aggregation (AGG_BENCH.json)"] = json.load(f)
    for bench in ("BENCH_r02.json", "BENCH_r03.json"):
        p = os.path.join(repo_root, bench)
        if os.path.exists(p):
            with open(p) as f:
                anchors[f"Leaf prove/verify ({bench})"] = json.load(f)
    return anchors


def main(argv=None):
    ap = argparse.ArgumentParser(description="generate the parameter-sweep report")
    ap.add_argument("--out", default="docs/sweep-results/report.md")
    args = ap.parse_args(argv)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    generate_report(args.out, anchors=collect_anchors(repo_root))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
