"""
BASELINE config 5: Cobaya-wrapped LCDM-like likelihood (d=6), parallel
truth evaluation + MC post-run.

The reference exercises this as a Cobaya input file driving its
CobayaWrapper sampler under ``mpirun`` (reference: gpry/cobaya.py:34-340,
gpry/CobayaWrapper.yaml), with truth evaluations split across MPI ranks
(reference: gpry/run.py:1200-1236).  Neither cobaya nor mpi4py is
installed in this image, so this benchmark runs the same code path
against ``tests/minicobaya.py`` (the API-compatible double used by the
test suite) and uses the single-host process-pool executor
(``truth_executor="processes"``, gpry_tpu/parallel/executor.py) — the
same contiguous-slice decomposition the ``"mpi"`` mode ships over DCN.

The likelihood is a correlated 6-parameter Gaussian with Planck-like
means/widths (ombh2, omch2, theta, tau, logA, ns — incl. the strong
tau-logA degeneracy), padded with an artificial per-call delay (default
40 ms) to emulate an expensive Boltzmann code: this is the regime the
framework targets, and what makes parallel truth evaluation measurable.

Metrics: truth evals to convergence, final weighted-MC KL vs the analytic
posterior (gate <= 0.05, reference tests/test_pipeline.py:88), total and
truth-phase wall time for serial vs process-parallel executors.

Usage: python benchmarks/lcdm.py [--delay 0.04] [--seeds 100]
Writes benchmarks/results_lcdm.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))

# Planck-2018-like marginals (means, stds) and a physically-shaped
# correlation structure (tau-logA 0.95 is the famous degeneracy).
PARAMS = ["ombh2", "omch2", "theta", "tau", "logA", "ns"]
MEANS = np.array([0.02237, 0.1200, 1.04092, 0.0544, 3.044, 0.9649])
STDS = np.array([0.00015, 0.0012, 0.00031, 0.0073, 0.014, 0.0042])
CORR = np.array([
    [1.00, -0.20, 0.30, 0.10, 0.10, 0.40],
    [-0.20, 1.00, -0.45, 0.00, 0.05, -0.55],
    [0.30, -0.45, 1.00, 0.05, 0.05, 0.35],
    [0.10, 0.00, 0.05, 1.00, 0.95, 0.10],
    [0.10, 0.05, 0.05, 0.95, 1.00, 0.15],
    [0.40, -0.55, 0.35, 0.10, 0.15, 1.00],
])
COV = CORR * np.outer(STDS, STDS)
# prior box at +-5 sigma, like tests/model_generator.py:random_gaussian
PRIOR_NSTD = 5.0


def model_info(delay=0.0):
    inv_cov = np.linalg.inv(COV)

    def loglike(**kw):
        if delay:
            time.sleep(delay)
        x = np.array([kw[p] for p in PARAMS])
        d = x - MEANS
        return -0.5 * d @ inv_cov @ d

    bounds = {p: [m - PRIOR_NSTD * s, m + PRIOR_NSTD * s]
              for p, m, s in zip(PARAMS, MEANS, STDS)}
    return {
        "params": {p: {"prior": {"min": b[0], "max": b[1]}}
                   for p, b in bounds.items()},
        "likelihood": {"lcdm_like": {"external": loglike,
                                     "input_params": PARAMS}},
    }


def run_one(seed, delay, executor, verbose=1):
    import minicobaya
    minicobaya.install()
    try:
        from cobaya.model import get_model

        from gpry_tpu.cobaya import CobayaWrapper
        from model_generator import kl_truth_gaussian

        model = get_model(model_info(delay=delay))
        # a batch is n_points_per_acq = d points; size the pool to the
        # batch (the host has few cores, but the expensive-likelihood
        # regime this emulates is wait-bound, so workers overlap)
        spec = executor if executor == "serial" else \
            {"mode": executor, "max_workers": len(PARAMS)}
        info = {
            "seed": seed,
            "verbose": verbose,
            "truth_executor": spec,
            "mc_sampler": "nested",
        }
        t0 = time.time()
        wrapper = CobayaWrapper(info, model)
        runner = wrapper.run()
        wall = time.time() - t0
        sample = wrapper.samples()
        kl = float(kl_truth_gaussian(sample["X"], sample["weights"],
                                     MEANS, COV))
        prog = runner.progress.data
        return {
            "seed": seed, "executor": executor, "delay_s": delay,
            "converged": bool(runner.has_converged),
            "n_total": int(runner.gpr.n_total),
            "n_finite": int(runner.gpr.n),
            "kl_final": kl,
            "wall_s": wall,
            "truth_wall_s": float(prog["time_truth"].sum()),
        }
    finally:
        minicobaya.uninstall()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="100,101,102")
    ap.add_argument("--delay", type=float, default=0.1)
    ap.add_argument("--verbose", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"],
                    help="cpu pins compute to the host (hardware-"
                         "independent evals metric); 'default' uses the "
                         "ambient accelerator")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_default_device", "cpu")
    seeds = [int(s) for s in args.seeds.split(",")]

    rows = []
    for seed in seeds:
        for executor in ("serial", "processes"):
            print(f"--- lcdm d=6 seed={seed} executor={executor} ...",
                  flush=True)
            row = run_one(seed, args.delay, executor,
                          verbose=args.verbose)
            print(json.dumps(row), flush=True)
            rows.append(row)

    summary = []
    for executor in ("serial", "processes"):
        sel = [r for r in rows if r["executor"] == executor]
        summary.append({
            "executor": executor,
            "n_converged": sum(r["converged"] for r in sel),
            "n_runs": len(sel),
            "evals_to_stop": [r["n_total"] for r in sel],
            "kl_final": [round(r["kl_final"], 4) for r in sel],
            "truth_wall_s": [round(r["truth_wall_s"], 2) for r in sel],
            "wall_s": [round(r["wall_s"], 1) for r in sel],
        })
    out = {"d": len(PARAMS), "delay_s": args.delay, "rows": rows,
           "summary": summary}
    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_lcdm.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(summary, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
