"""
Round-5 regression battery: the amplitude-underfit convergence veto
(the spike seed-100/102 failure: a globally overconfident small-n GP
declares convergence with every uncertainty-based guard blind), and the
small-mode edges of the mode-detection machinery
(``detect_modes(min_weight)`` / ``modes_match(weight_tol, rel_tol)``).

Measured motivation (spike fixture, benchmarks/nongaussian.py): the
underfit seeds converge at n=19 with fitted output scale 0.0045-0.01 of
their own training-y span, while the healthy seed sits at 0.33 — the
``amp_underfit_frac=0.05`` default splits that separation by ~10x on
each side.
"""

import numpy as np


def _rng(seed):
    return np.random.default_rng(seed)


def _make_gp(d, bounds, seed, **kw):
    from gpry_tpu.models.gp import GaussianProcessRegressor
    from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y
    return GaussianProcessRegressor(
        bounds=bounds, random_state=seed,
        preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), **kw)


# ---------------------------------------------------------------------------
# demand-driven fit frequency (VERDICT r4 item 3; reference contrast:
# gpry/run.py:536-537 schedules sparse full fits with no basin-jump net)
# ---------------------------------------------------------------------------


def test_demand_fit_skip_fires_and_stays_accurate():
    """Above the n gate, simple fits skip the polish when the screen finds
    no better basin — and the factorize-only iterations stay exact."""
    rng = _rng(7)
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
    rng = _rng(3)
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
    rng = _rng(11)
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


def test_demand_fit_full_downgrades_on_stable_basin():
    """Above the n gate, a scheduled FULL fit with an unmoved LML basin
    downgrades the multi-lane ladder to a 2-lane within-basin repolish —
    and the repolished theta still maximizes the LML (the incumbent is in
    the exact winner-selection set, so the downgrade is monotone)."""
    rng = _rng(13)
    d = 2
    bounds = np.array([[-1.0, 1.0]] * d)
    X = rng.uniform(-1, 1, (46, d))
    y = -np.sum(X ** 2, axis=1) * 8
    gp = _make_gp(d, bounds, 1, demand_fit_min_n=30, n_restarts_optimizer=6)
    gp.append_to_data(X[:30], y[:30], fit_gpr=True)
    assert gp.n_fits_downgraded == 0
    lml_before = gp.log_marginal_likelihood_value_
    for k in range(30, 42, 4):
        gp.append_to_data(X[k:k + 4], y[k:k + 4],
                          fit_gpr={"n_restarts": 6})
    assert gp.n_fits_downgraded >= 2
    assert np.isfinite(gp.log_marginal_likelihood_value_)
    assert gp.log_marginal_likelihood_value_ >= lml_before - 5.0
    mu = np.asarray(gp.predict(X[42:46])).ravel()
    assert np.allclose(mu, y[42:46], atol=0.05)


def test_demand_fit_full_ladder_runs_when_basin_moves():
    """A FULL fit whose screen finds a better basin must run the full
    ladder (no downgrade counted) and move theta."""
    rng = _rng(17)
    d = 2
    bounds = np.array([[-1.0, 1.0]] * d)
    X = rng.uniform(-1, 1, (30, d))
    y = -np.sum(X ** 2, axis=1)
    gp = _make_gp(d, bounds, 2, demand_fit_min_n=20, n_restarts_optimizer=6)
    gp.append_to_data(X, y, fit_gpr=True)
    theta_before = np.array(gp._theta)
    downgrades_before = gp.n_fits_downgraded
    # sharp high-amplitude structure: the old theta is far off
    Xs = rng.uniform(-0.2, 0.2, (6, d))
    ys = -np.sum((Xs / 0.05) ** 2, axis=1)
    gp.append_to_data(Xs, ys, fit_gpr={"n_restarts": 6})
    assert gp.n_fits_downgraded == downgrades_before
    assert not np.array_equal(theta_before, np.array(gp._theta)), \
        "basin moved but the full fit did not repolish"


def test_demand_fit_full_inert_below_threshold():
    """Below demand_fit_min_n, FULL fits are bit-identical with the
    feature disabled (same theta, same LML, same rng stream)."""
    rng = _rng(19)
    d = 2
    bounds = np.array([[-2.0, 2.0]] * d)
    X = rng.uniform(-2, 2, (40, d))
    y = -np.sum(X ** 2, axis=1) * 4
    gps = [_make_gp(d, bounds, 5, demand_fit_min_n=dmn,
                    n_restarts_optimizer=6) for dmn in (160, None)]
    for gp in gps:
        gp.append_to_data(X[:24], y[:24], fit_gpr=True)
        for k in range(24, 40, 4):
            gp.append_to_data(X[k:k + 4], y[k:k + 4],
                              fit_gpr={"n_restarts": 6})
    assert gps[0].n_fits_downgraded == 0 and gps[1].n_fits_downgraded == 0
    assert np.array_equal(gps[0]._theta, gps[1]._theta)
    assert gps[0].log_marginal_likelihood_value_ == \
        gps[1].log_marginal_likelihood_value_


# ---------------------------------------------------------------------------
# amplitude-underfit veto
# ---------------------------------------------------------------------------


def _make_runner(tmp_path, seed=0):
    from gpry_tpu.run import Runner

    def loglike(x):
        return float(-0.5 * np.sum((np.asarray(x) / 0.3) ** 2))

    return Runner(loglike, bounds=np.array([[-1.0, 1.0]] * 2), seed=seed,
                  verbose=1,
                  options={"max_total": 40, "n_initial": 8},
                  convergence_criterion=False, mc="uniform",
                  checkpoint=str(tmp_path / "amp_ckpt"),
                  load_checkpoint="overwrite")


def test_amp_underfit_detects_overconfident_gp(tmp_path):
    """A GP whose fitted output scale cannot cover its own data's span
    must trip the veto helper (the seed-102 blindness)."""
    r = _make_runner(tmp_path)
    rng = _rng(10)
    X = rng.uniform(-1, 1, size=(19, 2))
    # spike-like data: ~20 log-units of dynamic range
    y = -10.0 * np.sum(X ** 2, axis=1)
    r.gpr.append_to_data(X, y, fit_gpr=False)
    span = float(np.max(y) - np.min(y))
    assert span > 5.0
    # force a tiny fitted amplitude (what the ML fit chose at n=19 on
    # the real spike: huge lengthscales + near-zero output scale)
    theta = np.array(r.gpr.kernel_theta, dtype=float)
    theta[0] = -18.0  # log outputscale^2 -> outputscale ~ 1e-4
    r.gpr._theta = theta
    ratio = r._fitted_amp_span_ratio()
    assert np.isfinite(ratio) and ratio < 0.01
    assert r._surrogate_is_amp_underfit()


def test_amp_underfit_quiet_on_healthy_fit(tmp_path):
    """A properly fitted GP on smooth data must NOT trip the veto
    (healthy spike seed: ratio 0.33; threshold 0.05)."""
    r = _make_runner(tmp_path)
    rng = _rng(11)
    X = rng.uniform(-1, 1, size=(24, 2))
    y = -0.5 * np.sum((X / 0.3) ** 2, axis=1)
    r.gpr.append_to_data(X, y, fit_gpr=False)
    r.gpr.fit_gpr_hyperparameters(n_restarts=6)
    ratio = r._fitted_amp_span_ratio()
    assert np.isfinite(ratio) and ratio > 0.05, ratio
    assert not r._surrogate_is_amp_underfit()


def test_amp_underfit_nan_on_degenerate_inputs(tmp_path):
    """No data / constant data must return nan (veto inert), not crash."""
    r = _make_runner(tmp_path)
    assert not r._surrogate_is_amp_underfit()  # no data yet
    X = _rng(12).uniform(-1, 1, size=(5, 2))
    r.gpr.append_to_data(X, np.zeros(5), fit_gpr=False)  # zero span
    assert np.isnan(r._fitted_amp_span_ratio())
    assert not r._surrogate_is_amp_underfit()


def test_amp_underfit_end_to_end_no_blind_convergence(tmp_path):
    """End-to-end: a spike target at small n must not produce
    converged=True while the surrogate is amplitude-underfit.  Either
    the run honestly fails to converge within the tiny budget, or it
    converged with a sane amplitude."""
    from gpry_tpu.run import Runner

    def spike(x):
        x = np.asarray(x)
        base = -0.5 * np.sum((x / 3.0) ** 2)
        sp = np.sum((x - 1.2) ** 2) / (2 * 0.01 ** 2)
        return float(np.logaddexp(base, 12.0 - sp))

    r = Runner(spike, bounds=np.array([[-8.0, 8.0]] * 2), seed=2,
               verbose=1,
               options={"max_total": 40, "n_initial": 8,
                        "n_points_per_acq": 4},
               convergence_criterion="CorrectCounter", mc="uniform",
               checkpoint=str(tmp_path / "spike_ckpt"),
               load_checkpoint="overwrite")
    r.run()
    if r.has_converged:
        assert not r._surrogate_is_amp_underfit(), \
            ("converged=True with a globally overconfident surrogate: "
             f"amp/span ratio {r._fitted_amp_span_ratio():.4g}")


# ---------------------------------------------------------------------------
# off-batch (audit) evals feed the CorrectCounter streak (VERDICT r4 item 8)
# ---------------------------------------------------------------------------


def test_correctcounter_scores_offbatch_evals():
    """Audit/calibration truth evals count toward (and against) the
    CorrectCounter streak under the same tolerance rule as acquisition
    evals — so runs whose budget is mostly audit spend can still earn
    the declaration from the evals they DID spend."""
    from gpry_tpu.convergence import CorrectCounter

    class _GP:
        y_max = 0.0
        n_total = 10
        n = 10

    cc = CorrectCounter(np.array([[-1.0, 1.0]]), {"abstol": 0.1,
                                                  "reltol": 0.01})
    gp = _GP()
    # three correct off-batch evals extend the streak
    y = np.array([-5.0, -6.0, -7.0])
    cc.score_offbatch(gp, new_y=y, pred_y=y + 0.01)
    assert cc.n_pred == 3
    # a miss resets it, honestly
    cc.score_offbatch(gp, new_y=np.array([-5.0]), pred_y=np.array([-1.0]))
    assert cc.n_pred == 0
    # -inf truths and non-finite predictions are skipped, not scored
    cc.score_offbatch(gp, new_y=np.array([-np.inf, -3.0]),
                      pred_y=np.array([-np.inf, np.nan]))
    assert cc.n_pred == 0
    # off-batch scoring records NO criterion value (series is per-check)
    assert cc.values == []


# ---------------------------------------------------------------------------
# small-mode edges of the mode machinery (VERDICT r4 weak #5)
# ---------------------------------------------------------------------------


def test_detect_modes_small_mode_d4():
    """A 4%-mass mode at d=4 sits ABOVE the min_weight=0.02 noise cut
    and must be detected with a faithful weight."""
    from gpry_tpu.utils.modes import detect_modes
    rng = _rng(50)
    n = 8000
    X = np.concatenate([
        rng.normal(0.0, 0.5, size=(int(0.96 * n), 4)),
        rng.normal(6.0, 0.5, size=(int(0.04 * n), 4)),
    ])
    modes = detect_modes(X, rng=5)
    assert len(modes) == 2
    assert abs(modes[1]["weight"] - 0.04) < 0.02
    assert np.allclose(modes[1]["mean"], 6.0, atol=0.6)


def test_detect_modes_min_weight_drops_noise():
    """A sub-2% cluster (noise scale at n_resample=1024) is dropped."""
    from gpry_tpu.utils.modes import detect_modes
    rng = _rng(51)
    n = 10000
    X = np.concatenate([
        rng.normal(0.0, 0.5, size=(int(0.995 * n), 4)),
        rng.normal(6.0, 0.5, size=(int(0.005 * n), 4)),
    ])
    modes = detect_modes(X, rng=6)
    assert len(modes) == 1


def test_modes_match_small_mode_drift_vetoes():
    """The relative tolerance closes the small-mode blind spot: a 3%
    mode drifting to 12% (4x its mass) must NOT count as stable, even
    though |0.03-0.12| < weight_tol=0.15."""
    from gpry_tpu.utils.modes import modes_match
    a = (2, (0.97, 0.03))
    b = (2, (0.88, 0.12))
    assert not modes_match(a, b)
    # settled small mode: 3% vs 4% still matches
    assert modes_match((2, (0.97, 0.03)), (2, (0.96, 0.04)))
    # large-mode behavior unchanged: 0.10 absolute drift still matches
    assert modes_match((2, (0.55, 0.45)), (2, (0.45, 0.55)))
    # count mismatch still vetoes
    assert not modes_match((2, (0.5, 0.5)), (3, (0.4, 0.4, 0.2)))
