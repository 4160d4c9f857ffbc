"""
d=16 benchmark on the REAL TPU, through the crash-resilient driver.

The reference's applicability envelope is d <~ 20 (reference
README.rst:60-64).  Round-2 d=16 runs died 3/3 on shared-TPU-tunnel worker
restarts (docs/ROUND2.md); this driver runs them through
``gpry_tpu.run.run_resilient`` (checkpoint-reload-retry re-materializes
all device buffers after a worker crash) and commits evals-to-stop + final
KL vs the analytic truth.

Usage: python benchmarks/d16.py [--d 16] [--seeds 100,101,102]
Writes benchmarks/results_d{d}.json (merging runs as they finish, so a
driver-level crash loses at most the in-flight run).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))


def run_one(d, seed, ckpt_root, verbose=2):
    from model_generator import kl_truth_gaussian, random_gaussian

    from gpry_tpu.run import run_resilient

    m = random_gaussian(d=d, rng=seed)
    ckpt = os.path.join(ckpt_root, f"d{d}_s{seed}")
    retries = {"n": 0}

    t0 = time.time()
    runner = run_resilient(
        m.loglike, bounds=m.bounds, seed=seed, verbose=verbose,
        checkpoint=ckpt, max_retries=6, retry_wait_s=90,
        gp_acquisition={"NORA": {}})
    wall = time.time() - t0
    X, w, _ = runner.last_mc_samples()
    kl = float(kl_truth_gaussian(X, w, m.mean, m.cov))
    return {
        "d": d,
        "seed": seed,
        "converged": bool(runner.has_converged),
        "n_total": int(runner.gpr.n_total),
        "n_finite": int(runner.gpr.n),
        "kl_final": kl,
        "wall_s": round(wall, 1),
        "retries": retries["n"],
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--seeds", default="100,101,102")
    ap.add_argument("--verbose", type=int, default=2)
    ap.add_argument("--ckpt-root", default="/tmp/gpry_tpu_d16")
    args = ap.parse_args()
    seeds = tuple(int(x) for x in args.seeds.split(","))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"results_d{args.d}.json")
    rows = []
    for seed in seeds:
        print(f"=== d={args.d} seed={seed} ===", flush=True)
        try:
            row = run_one(args.d, seed, args.ckpt_root,
                          verbose=args.verbose)
        except Exception as excpt:
            row = {"d": args.d, "seed": seed,
                   "error": f"{type(excpt).__name__}: {excpt}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        ok = [r for r in rows if "error" not in r]
        summary = {
            "d": args.d,
            "engine": "gpry_tpu(NORA) via run_resilient, real TPU",
            "evals_to_stop": [r["n_total"] for r in ok],
            "kl_final": [r["kl_final"] for r in ok],
            "n_converged": int(sum(r.get("converged", False)
                                   for r in rows)),
            "n_completed": len(ok),
            "n_runs": len(rows),
            "wall_s": [r.get("wall_s") for r in rows],
            "runs": rows,
        }
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, default=float)
    print(f"-> {out_path}")
