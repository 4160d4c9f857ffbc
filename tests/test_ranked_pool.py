"""
RankedPool behavior + performance harness.

Mirrors the reference's tests/test_ranked_pool.py: d=8, 20d training
points, rank 1000·d NS-like candidates; reports wall time per method when
run as a script.  As a pytest it checks method consistency on a smaller
problem.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from gpry_tpu.acquisition.ranked_pool import RankedPool
from gpry_tpu.models.gp import GaussianProcessRegressor
from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y


def _setup(d, n_train, seed=0):
    rng = np.random.default_rng(seed)
    bounds = np.array([[0.0, 1.0]] * d)
    X = rng.uniform(size=(n_train, d))
    y = -0.5 * 25 * np.sum((X - 0.5) ** 2, axis=1)
    gpr = GaussianProcessRegressor(
        bounds=bounds, preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), random_state=seed, verbose=1)
    gpr.append_to_data(X, y, fit_gpr={"n_restarts": 4})
    noise_var = float(gpr.noise_level) ** 2
    zeta = d ** (-0.85)

    def acq_fn(yv, sv):
        var = sv * sv - noise_var
        ok = (var > 0) & np.isfinite(yv)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = 2 * zeta * (yv - gpr.y_max) + 0.5 * np.log(
                np.where(ok, var, 1.0))
        return np.where(ok, vals, -np.inf)

    return gpr, acq_fn, rng


def test_methods_agree_on_head():
    """bulk and single-sort-acq must select the same top candidate set on a
    well-separated problem."""
    d = 3
    gpr, acq_fn, rng = _setup(d, 30)
    cand = rng.uniform(size=(300, d))
    pools = {}
    for method in ("bulk", "single sort acq"):
        pool = RankedPool(d, gpr, acq_fn)
        pool.add(cand, method=method)
        pools[method] = pool.get()
    X_bulk = pools["bulk"][0]
    X_single = pools["single sort acq"][0]
    # the first (unconditioned-argmax) element always agrees
    assert np.allclose(X_bulk[0], X_single[0])
    # heads should overlap substantially (orders may differ in ties)
    common = sum(
        any(np.allclose(a, b) for b in X_single) for a in X_bulk)
    assert common >= max(1, len(X_bulk) - 1)


def perf_harness(d=8, n_train_per_d=20, n_cand_per_d=1000):
    """Timing harness (run as a script, like the reference's)."""
    gpr, acq_fn, rng = _setup(d, n_train_per_d * d)
    cand = rng.uniform(size=(n_cand_per_d * d, d))
    for method in ("bulk", "single sort acq", "single sort y"):
        pool = RankedPool(d, gpr, acq_fn)
        t0 = time.time()
        pool.add(cand, method=method)
        dt = time.time() - t0
        print(f"method={method!r}: {dt:.3f}s "
              f"(cache builds: {pool.cache_counter})")


if __name__ == "__main__":
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    perf_harness(d=d)
