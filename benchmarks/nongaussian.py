"""
Non-Gaussian benchmark battery (reference fixtures:
tests/model_generator.py:84-291): Loggaussian, Curved degeneracy (with an
-inf floor so the SVM infinities classifier actually trains — BASELINE
config 4), Ring, Himmelblau, Rosenbrock, Spike.

Metric: there is no analytic posterior for most of these, so accuracy is a
moments-level comparison — the symmetric Gaussian-KL between the moments of
the surrogate's final MC sample and a ground truth.  For d <= 2 fixtures
the ground-truth moments are EXACT (dense-grid quadrature): an MH sample
is a noisy and, on well-separated multimodal targets (Himmelblau, Spike),
poorly-mixed reference.  Above d=2 the ground truth is an MC sample drawn
by the same ensemble-MH sampler on the true log-likelihood
(benchmarks/parity.py:mh_sample_surrogate — identical sampler on both
sides, so estimator bias cancels).  For the curved+SVM fixture the
reference engine is also run head-to-head (VERDICT round-2 item 3).

Usage: python benchmarks/nongaussian.py [--seeds 100,101,102]
Writes benchmarks/results_nongaussian.json.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from parity import mh_sample_surrogate, run_reference  # noqa: E402

CURVED_INF_FLOOR = -150.0


def _fixtures(seed):
    from model_generator import (curved_degeneracy, flat_base_spike,
                                 himmelblau, loggaussian, ring, rosenbrock,
                                 spike)
    return [
        loggaussian(d=4, d_log=2, rng=seed),
        curved_degeneracy(inf_floor=CURVED_INF_FLOOR),
        ring(),
        himmelblau(),
        rosenbrock(),
        spike(),
        flat_base_spike(),
    ]


def moments_kl(Xa, wa, Xb, wb):
    """Symmetric Gaussian-KL between the moments of two weighted samples."""
    from gpry_tpu.utils.tools import mean_covmat_from_samples
    return moments_kl_vs_exact(Xa, wa, *mean_covmat_from_samples(Xb, wb))


def truth_sample(model, seed):
    """Ground-truth ensemble-MH sample on the true loglike."""

    rng = np.random.default_rng(77_000 + seed)
    return mh_sample_surrogate(model.loglike_batch, model.bounds, rng,
                               n_walkers=64, n_steps=6000)


def truth_moments_grid(model, n_1d=100_001, n_2d=1001):
    """EXACT posterior moments by dense-grid quadrature (d <= 2 only).

    MH ground truth is itself noisy, and on well-separated multimodal
    targets (Himmelblau's 4 modes, Spike's broad+narrow pair) the chains
    mix between modes too rarely for stable mode weights — quadrature
    removes the reference's own error from the metric entirely.
    """
    b = model.bounds
    if model.d == 1:
        X = np.linspace(b[0, 0], b[0, 1], n_1d)[:, None]
    elif model.d == 2:
        g0 = np.linspace(b[0, 0], b[0, 1], n_2d)
        g1 = np.linspace(b[1, 0], b[1, 1], n_2d)
        X = np.stack(np.meshgrid(g0, g1, indexing="ij"),
                     axis=-1).reshape(-1, 2)
    else:
        raise ValueError("grid quadrature only for d <= 2")
    logp = model.loglike_batch(X)
    logp -= np.max(logp[np.isfinite(logp)])
    w = np.where(np.isfinite(logp), np.exp(logp), 0.0)
    w /= w.sum()
    mean = w @ X
    diff = X - mean
    cov = (w[:, None] * diff).T @ diff
    return mean, np.atleast_2d(cov)


def moments_kl_vs_exact(Xa, wa, mean_t, cov_t):
    """Symmetric Gaussian-KL between a weighted sample's moments and
    exact (quadrature) moments."""
    from gpry_tpu.utils.tools import kl_norm, mean_covmat_from_samples
    ma, Ca = mean_covmat_from_samples(Xa, wa)
    return float(max(kl_norm(ma, Ca, mean_t, cov_t),
                     kl_norm(mean_t, cov_t, ma, Ca)))


def run_repo_nora(model, seed, verbose=1):
    """This repo's Runner with the production NORA engine + device NS MC."""
    from gpry_tpu.run import Runner

    t0 = time.time()
    runner = Runner(model.loglike, bounds=model.bounds, seed=seed,
                    verbose=verbose, gp_acquisition={"NORA": {}})
    runner.run()
    if runner.last_mc_result is None:
        runner.generate_mc_sample()
    r = runner.last_mc_result
    return {
        "engine": "gpry_tpu(NORA)",
        "converged": bool(runner.has_converged),
        "n_total": int(runner.gpr.n_total),
        "n_finite": int(runner.gpr.n),
        "svm_active": bool(runner.gpr.n < runner.gpr.n_total),
        "wall_s": time.time() - t0,
        # fit-phase wall + demand-driven skip count (VERDICT r4 item 3:
        # the large-n fit cost is the loggaussian bottleneck)
        "fit_wall_s": float(np.nansum(
            runner.progress.data["time_fit"].to_numpy(dtype=float))),
        "n_fits_skipped": int(getattr(runner.gpr, "n_fits_skipped", 0)),
        "n_fits_downgraded": int(getattr(runner.gpr,
                                         "n_fits_downgraded", 0)),
        "mc_X": r["X"], "mc_w": r["weights"],
    }


#: grid-quadrature moments memo — the d<=2 fixtures are seed-independent
_GRID_MOMENTS = {}


def run_battery(seeds=(100, 101, 102), verbose=1, with_reference=True,
                only=None):
    rows = []
    for seed in seeds:
        for model in _fixtures(seed):
            if only and not any(model.name.startswith(o) for o in only):
                continue
            print(f"--- {model.name} seed={seed} ...", flush=True)
            if model.d <= 2:
                if model.name not in _GRID_MOMENTS:
                    _GRID_MOMENTS[model.name] = truth_moments_grid(model)
                mt, ct = _GRID_MOMENTS[model.name]
                kl_of = lambda X, w: moments_kl_vs_exact(X, w, mt, ct)
                truth_kind = "grid_quadrature"
            else:
                Xt, wt = truth_sample(model, seed)
                kl_of = lambda X, w: moments_kl(X, w, Xt, wt)
                truth_kind = "ensemble_mh"
            try:
                res = run_repo_nora(model, seed, verbose=verbose)
            except Exception as excpt:
                rows.append({"fixture": model.name, "seed": seed,
                             "engine": "gpry_tpu(NORA)",
                             "error": f"{type(excpt).__name__}: {excpt}"})
                print(f"    FAILED: {excpt}", flush=True)
                continue
            mcX, mcw = res.pop("mc_X"), res.pop("mc_w")
            res.update({
                "fixture": model.name, "seed": seed, "truth": truth_kind,
                "moments_kl_vs_truth": kl_of(mcX, mcw),
            })
            rows.append(res)
            print(f"    {res['engine']}: converged={res['converged']} "
                  f"n_total={res['n_total']} n_finite={res['n_finite']} "
                  f"momKL={res['moments_kl_vs_truth']:.4f} "
                  f"wall={res['wall_s']:.1f}s", flush=True)
            # head-to-head vs the reference on the curved+SVM fixture
            if with_reference and model.name == "curved_degeneracy_inf":
                try:
                    ref = run_reference(model, seed, verbose=verbose)
                    predict = ref.pop("predict")
                    rng_mc = np.random.default_rng(10_000 + seed)
                    Xs, ws = mh_sample_surrogate(predict, model.bounds,
                                                 rng_mc)
                    ref.update({
                        "fixture": model.name, "seed": seed,
                        "truth": truth_kind,
                        "moments_kl_vs_truth": kl_of(Xs, ws),
                    })
                    rows.append(ref)
                    print(f"    reference: converged={ref['converged']} "
                          f"n_total={ref['n_total']} "
                          f"momKL={ref['moments_kl_vs_truth']:.4f} "
                          f"wall={ref['wall_s']:.1f}s", flush=True)
                except Exception as excpt:
                    rows.append({"fixture": model.name, "seed": seed,
                                 "engine": "reference",
                                 "error": f"{type(excpt).__name__}: "
                                          f"{excpt}"})
                    print(f"    reference FAILED: {excpt}", flush=True)
    return rows


def summarize(rows):
    out = {"curved_inf_floor": CURVED_INF_FLOOR, "rows": rows,
           "summary": []}
    fixtures = sorted({r["fixture"] for r in rows if "error" not in r})
    for fx in fixtures:
        for engine in sorted({r["engine"] for r in rows
                              if r.get("fixture") == fx
                              and "error" not in r}):
            sel = [r for r in rows if r.get("fixture") == fx
                   and r.get("engine") == engine and "error" not in r]
            out["summary"].append({
                "fixture": fx, "engine": engine,
                "evals_to_stop": [r["n_total"] for r in sel],
                "n_finite": [r["n_finite"] for r in sel],
                "svm_active": [bool(r.get("svm_active",
                                          r["n_finite"] < r["n_total"]))
                               for r in sel],
                "moments_kl": [round(r["moments_kl_vs_truth"], 4)
                               for r in sel],
                "n_converged": int(sum(r["converged"] for r in sel)),
                "wall_s_median": float(np.median([r["wall_s"]
                                                  for r in sel])),
            })
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"],
                    help="cpu pins compute to the host (hardware-"
                         "independent evals metric); 'default' uses the "
                         "ambient accelerator")
    ap.add_argument("--seeds", default="100,101,102")
    ap.add_argument("--verbose", type=int, default=1)
    ap.add_argument("--no-reference", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated fixture-name prefixes")
    ap.add_argument("--merge", action="store_true",
                    help="merge rows into an existing results file")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_default_device", "cpu")
    seeds = tuple(int(x) for x in args.seeds.split(","))
    only = tuple(args.only.split(",")) if args.only else None
    rows = run_battery(seeds=seeds, verbose=args.verbose,
                       with_reference=not args.no_reference, only=only)
    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_nongaussian.json")
    if args.merge and os.path.exists(path):
        old = json.load(open(path))["rows"]
        fresh = {(r.get("fixture"), r.get("seed"), r.get("engine"))
                 for r in rows}
        rows = [r for r in old
                if (r.get("fixture"), r.get("seed"),
                    r.get("engine")) not in fresh] + rows
    out = summarize(rows)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out["summary"], indent=1))
    print(f"-> {path}")
