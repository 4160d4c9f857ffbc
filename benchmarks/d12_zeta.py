"""
Controlled zeta (exploitation-weight) experiment at d=12 (VERDICT round-4
item 6): the repo stops at 234/174/222 evals on the d=12 Gaussian parity
fixture vs the reference's 168/156/156, with equal-or-better final KL.
Round 4 localized the residual gap to acquisition geometry (the chunked
restart experiment was tried and reverted).  This driver measures the
evals/KL Pareto frontier of the remaining first-order acquisition knob:
the LogExp exploitation weight zeta (reference auto-scale d**-0.85,
gpry/acquisition_functions.py:906-934) scaled by k in {1, 1.5, 2, 3}.

Larger zeta weights the (mu - y_max) exploitation term over the log-sigma
exploration term, concentrating late-run batches near the mode -- the
hypothesis is fewer far-field evals at the cost of slower uncertainty
contraction (possibly worse KL or non-convergence).

Writes benchmarks/results_d12_zeta.json: one row per (seed, k) with
evals-to-stop and final KL vs the fixture's analytic moments.

Usage: python benchmarks/d12_zeta.py [--seeds 100,102] [--ks 1,1.5,2,3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from parity import mh_sample_surrogate  # noqa: E402


def run_zeta(model, seed, k, verbose=1):
    from gpry_tpu.run import Runner

    class _NoMCRunner(Runner):
        def generate_mc_sample(self, *a, **k2):
            return None

        def diagnose_last_mc_sample(self):
            return True

    d = model.d
    zeta = float(k) * d ** -0.85
    t0 = time.time()
    runner = _NoMCRunner(
        model.loglike, bounds=model.bounds, seed=seed, verbose=verbose,
        gp_acquisition={"BatchOptimizer": {
            "acq_func": {"LogExp": {"zeta": zeta, "dimension": d}}}})
    runner.run()
    return runner, time.time() - t0


def main(seeds, ks, verbose=1):
    from model_generator import kl_truth_gaussian, random_gaussian

    rows = []
    for seed in seeds:
        model = random_gaussian(d=12, rng=seed)
        for k in ks:
            print(f"--- d=12 seed={seed} zeta_mult={k} ...", flush=True)
            try:
                runner, wall = run_zeta(model, seed, k, verbose=verbose)
            except Exception as excpt:
                rows.append({"seed": seed, "zeta_mult": k,
                             "error": f"{type(excpt).__name__}: {excpt}"})
                print(f"    FAILED: {excpt}", flush=True)
                continue
            rng_mc = np.random.default_rng(10_000 + seed)
            Xs, w = mh_sample_surrogate(
                lambda X: runner.gpr.predict(np.atleast_2d(X)),
                model.bounds, rng_mc)
            kl = float(kl_truth_gaussian(Xs, w, model.mean, model.cov))
            row = {"seed": seed, "zeta_mult": k,
                   "converged": bool(runner.has_converged),
                   "n_total": int(runner.gpr.n_total),
                   "n_finite": int(runner.gpr.n),
                   "kl_final": kl, "wall_s": wall}
            rows.append(row)
            print(f"    {row}", flush=True)
    return rows


if __name__ == "__main__":
    import jax
    jax.config.update("jax_default_device", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="100,102")
    ap.add_argument("--ks", default="1,1.5,2,3")
    ap.add_argument("--verbose", type=int, default=1)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    ks = [float(s) for s in args.ks.split(",")]
    rows = main(seeds, ks, verbose=args.verbose)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_d12_zeta.json")
    with open(out, "w") as f:
        json.dump({"fixture": "random_gaussian d=12 (parity battery "
                              "fixture)",
                   "reference_anchor": "evals 168/156/156 (seeds "
                                       "100/101/102, results_parity_d12)",
                   "rows": rows}, f, indent=1, default=float)
    print("wrote", out)
