"""N-scaling sweep of the canonical private batch: the counterpart of the
reference's layer-0 table (paper/main.tex:459-474, N=2..32 prove times).

Runs tools_bench_agg at each N sequentially (ONE JAX process at a time) and
collects the per-N records into AGG_SWEEP.json.

    python tools_bench_agg_sweep.py [--n 2 4 8] [--warm]
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--timeout", type=int, default=10800, help="per-N seconds")
    ap.add_argument("--out", default=os.path.join(HERE, "AGG_SWEEP.json"))
    args = ap.parse_args()

    ref = {2: 1.55, 4: 2.81, 8: 5.39, 16: 10.74, 32: 21.71}  # paper table, M2 Max
    rows = []
    for n in args.n:
        tmp = os.path.join(HERE, f".agg_bench_n{n}.json")
        cmd = [
            sys.executable, os.path.join(HERE, "tools_bench_agg.py"),
            "--n-leaf", str(n), "--skip-public-batch", "--out", tmp,
        ]
        if args.warm:
            cmd.append("--warm")
        print(f"=== N={n}: {' '.join(cmd[1:])}", flush=True)
        r = subprocess.run(cmd, timeout=args.timeout)
        if r.returncode != 0:
            rows.append({"n_leaf": n, "error": f"rc={r.returncode}"})
            continue
        with open(tmp) as f:
            rec = json.load(f)
        rec["reference_s"] = ref.get(n)
        rows.append(rec)
        with open(args.out, "w") as f:  # checkpoint after each N
            json.dump(rows, f, indent=2)
            f.write("\n")
    print(json.dumps([
        {k: r.get(k) for k in ("n_leaf", "private_batch_prove_s", "reference_s",
                               "peak_mb", "warm", "error")}
        for r in rows
    ], indent=2))


if __name__ == "__main__":
    main()
