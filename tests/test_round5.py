"""
Round-5 regression battery: demand-driven fit frequency (VERDICT round-4
item 3), audit hardening for overconfident small-n surrogates (item 5),
and mode-veto edge behavior (item 7).

The reference handles large-n hyperparameter-fit cost by scheduling full
fits sparsely with no basin-jump safety net (reference gpry/run.py:536-537);
the repo's demand-driven skip keeps the every-iteration batched LML screen
and skips only the L-BFGS polish while the screen finds no better basin.
"""

import numpy as np
import pytest


def _make_gp(d, bounds, seed, **kw):
    from gpry_tpu.models.gp import GaussianProcessRegressor
    from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y
    return GaussianProcessRegressor(
        bounds=bounds, random_state=seed,
        preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), **kw)


# ---------------------------------------------------------------------------
# demand-driven fit frequency
# ---------------------------------------------------------------------------


def test_demand_fit_skip_fires_and_stays_accurate():
    """Above the n gate, simple fits skip the polish when the screen finds
    no better basin — and the factorize-only iterations stay exact."""
    rng = np.random.default_rng(7)
    d = 2
    bounds = np.array([[-1.0, 1.0]] * d)
    X = rng.uniform(-1, 1, (46, d))
    y = -np.sum(X ** 2, axis=1) * 8
    gp = _make_gp(d, bounds, 1, demand_fit_min_n=30, n_restarts_optimizer=6)
    gp.append_to_data(X[:30], y[:30], fit_gpr=True)
    assert gp.n_fits_skipped == 0
    for k in range(30, 42, 4):
        gp.append_to_data(X[k:k + 4], y[k:k + 4], fit_gpr="simple")
    # a well-fit unimodal LML basin does not move: most iterations skip
    assert gp.n_fits_skipped >= 2
    assert np.isfinite(gp.log_marginal_likelihood_value_)
    mu = np.asarray(gp.predict(X[42:46])).ravel()
    assert np.allclose(mu, y[42:46], atol=0.05)


def test_demand_fit_gate_is_inert_below_threshold():
    """Below demand_fit_min_n the code path (and the GP rng stream) is
    unchanged: default-gated and disabled GPs produce bit-identical fits.
    This is the cheap pin of the d=4-parity invariance: every parity-
    battery run at d <= 4 stops well under n=160, so the default gate
    cannot perturb evals-to-stop there."""
    rng = np.random.default_rng(3)
    d = 2
    bounds = np.array([[-2.0, 2.0]] * d)
    X = rng.uniform(-2, 2, (40, d))
    y = -np.sum(X ** 2, axis=1) * 4
    gps = [_make_gp(d, bounds, 5, demand_fit_min_n=dmn,
                    n_restarts_optimizer=4) for dmn in (160, None)]
    for gp in gps:
        gp.append_to_data(X[:24], y[:24], fit_gpr=True)
        for k in range(24, 40, 4):
            gp.append_to_data(X[k:k + 4], y[k:k + 4], fit_gpr="simple")
    assert gps[0].n_fits_skipped == 0 and gps[1].n_fits_skipped == 0
    assert np.array_equal(gps[0]._theta, gps[1]._theta)
    assert gps[0].log_marginal_likelihood_value_ == \
        gps[1].log_marginal_likelihood_value_


def test_demand_fit_skip_polishes_when_basin_moves():
    """A target whose LML basin shifts (new data in a far corner changes
    the y scale structure) must trigger a real polish, not a skip."""
    rng = np.random.default_rng(11)
    d = 2
    bounds = np.array([[-1.0, 1.0]] * d)
    X = rng.uniform(-1, 1, (36, d))
    # smooth broad surface first ...
    y = -np.sum(X ** 2, axis=1)
    gp = _make_gp(d, bounds, 2, demand_fit_min_n=20, n_restarts_optimizer=6)
    gp.append_to_data(X[:30], y[:30], fit_gpr=True)
    theta_before = np.array(gp._theta)
    # ... then sharp high-amplitude structure: the old theta is far off
    Xs = rng.uniform(-0.2, 0.2, (6, d))
    ys = -np.sum((Xs / 0.05) ** 2, axis=1)
    gp.append_to_data(Xs, ys, fit_gpr="simple")
    assert not np.array_equal(theta_before, np.array(gp._theta)), \
        "basin moved but the simple fit skipped the polish"
