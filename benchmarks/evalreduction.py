"""
Likelihood-eval reduction vs direct nested sampling — the reference's
headline claim ("a factor of 100 or more" fewer posterior evaluations
than MCMC/NS, reference README.rst:16, doc/how_does_gpry_work.rst:4),
measured instead of asserted.

Both sides sample the SAME random correlated Gaussian (the reference's
fixture) to the same quality bar (Gaussian-KL vs the analytic posterior
<= 0.05, reference tests/test_pipeline.py:88):

* **direct NS**: this repo's on-device nested sampler run straight on the
  true log-likelihood at final-MC settings (nlive=50d, num_repeats=5d,
  precision 0.01 — gpry/run.py:1660, mc/samples.py), with
  ``NSResult.n_calls`` counting every log-density evaluation exactly;
* **active-learning runner**: truth evals to convergence from the
  committed head-to-head table (benchmarks/results_parity.json,
  results_d12.json) — measured on identical fixtures/seeds.

Usage: python benchmarks/evalreduction.py [--dims 4,8] [--seed 100]
Writes benchmarks/results_evalreduction.json.
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


def _truth_logl_fn(params, X):
    """Jittable (nq, d) -> (nq,) Gaussian log-likelihood; all state in
    ``params`` (module-level fn so the jit cache persists, see
    mc/nested.py:run_nested_device)."""
    import jax.numpy as jnp
    mean, inv = params
    diff = X - mean
    return -0.5 * jnp.einsum("ni,ij,nj->n", diff, inv, diff)


def direct_ns(model, seed):
    """Nested-sample the true likelihood at final-MC effort; return the
    exact eval count and the weighted-sample KL vs the analytic truth."""
    import jax
    import jax.numpy as jnp

    from gpry_tpu.mc.nested import run_nested_device
    from model_generator import kl_truth_gaussian

    d = len(model.mean)
    nlive = 50 * d
    num_repeats = 5 * d
    max_dead = max(4000, 60 * d * nlive // 10)
    params = (jnp.asarray(model.mean), jnp.asarray(np.linalg.inv(model.cov)))
    lo = jnp.asarray(model.bounds[:, 0])
    hi = jnp.asarray(model.bounds[:, 1])
    t0 = time.time()
    res = run_nested_device(
        _truth_logl_fn, params, jax.random.PRNGKey(seed), lo, hi,
        nlive=nlive, num_repeats=num_repeats, precision_criterion=0.01,
        max_dead=max_dead)
    n_dead = int(res.n_dead)
    n = n_dead + nlive
    X = np.asarray(res.X)[:n]
    logw = np.asarray(res.logw)[:n]
    w = np.exp(logw - logw.max())
    kl = float(kl_truth_gaussian(X, w, model.mean, model.cov))
    return {
        "n_calls": int(res.n_calls),
        "n_dead": n_dead,
        "kl": kl,
        "wall_s": round(time.time() - t0, 1),
        "nlive": nlive,
        "num_repeats": num_repeats,
    }


def runner_evals_from_committed(d, seed):
    """Evals-to-stop for the same (d, seed) from the committed
    head-to-head results (gpry_tpu engine rows)."""
    bdir = os.path.dirname(os.path.abspath(__file__))
    for fname in ("results_parity.json", "results_parity_d12.json",
                  "results_parity_seeds2.json"):
        path = os.path.join(bdir, fname)
        if not os.path.exists(path):
            continue
        data = json.load(open(path))
        for r in data.get("rows", data if isinstance(data, list) else []):
            if (r.get("d") == d and r.get("seed") == seed
                    and "gpry_tpu" in str(r.get("engine", ""))
                    and "n_total" in r):
                return int(r["n_total"]), r.get("kl_final")
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="4,8")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_default_device", "cpu")

    from model_generator import random_gaussian

    rows = []
    for d in (int(x) for x in args.dims.split(",")):
        model = random_gaussian(d=d, rng=args.seed)
        print(f"--- direct NS on truth, d={d} seed={args.seed} ...",
              flush=True)
        ns = direct_ns(model, args.seed)
        runner_evals, runner_kl = runner_evals_from_committed(d, args.seed)
        row = {
            "d": d, "seed": args.seed,
            "direct_ns": ns,
            "runner_evals_to_stop": runner_evals,
            "runner_kl": runner_kl,
            "reduction_factor": (round(ns["n_calls"] / runner_evals, 1)
                                 if runner_evals else None),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = {"rows": rows, "note": "reduction = direct-NS log-density calls "
           "/ runner truth evals, same fixture+seed, both under the 0.05 "
           "KL gate"}
    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_evalreduction.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
