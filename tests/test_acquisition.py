"""
Acquisition-layer tests: LogExp values/gradients vs the reference formula,
BatchOptimizer optimization quality, RankedPool Kriging-believer ordering.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from gpry_tpu.acquisition import BatchOptimizer, LogExp, NORA, RankedPool
from gpry_tpu.acquisition.base import append_lie
from gpry_tpu.models.gp import GaussianProcessRegressor, surrogate_predict
from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y


def make_fitted_gpr(rng, d=2, n=25, scale=25.0):
    bounds = np.array([[0.0, 1.0]] * d)
    X = rng.uniform(size=(n, d))
    diff = X - 0.5
    y = -0.5 * scale * np.sum(diff * diff, axis=1)
    gpr = GaussianProcessRegressor(
        bounds=bounds, preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), n_restarts_optimizer=6,
        random_state=11)
    gpr.append_to_data(X, y, fit_gpr={"n_restarts": 6})
    return gpr


def test_logexp_formula():
    """log A = 2 zeta (mu - y_max) + log sqrt(sigma^2 - sigma_n^2), -inf
    where sigma^2 <= sigma_n^2 (reference formula,
    gpry/acquisition_functions.py:1068-1074)."""
    acq = LogExp(zeta=0.3)
    mu = jnp.asarray([0.0, -5.0, -np.inf, 2.0])
    std = jnp.asarray([0.5, 1.0, 1.0, 0.001])
    y_max, noise = 0.0, 0.01
    vals = np.asarray(acq.values(mu, std, y_max, noise))
    expected0 = 2 * 0.3 * (0.0 - 0.0) + 0.5 * np.log(0.5**2 - 0.01**2)
    expected1 = 2 * 0.3 * (-5.0) + 0.5 * np.log(1.0 - 0.01**2)
    assert np.isclose(vals[0], expected0)
    assert np.isclose(vals[1], expected1)
    assert vals[2] == -np.inf           # non-finite mu
    assert vals[3] == -np.inf           # sigma below noise


def _reference_logexp(mu, std, y_max, sigma_n, zeta):
    """Literal numpy transcription of the reference's BaseLogExp.__call__
    + LogExp.f (gpry/acquisition_functions.py:973-992,1068-1074):
    sigma_n is the noise *std* (mean of per-point stds), squared inside."""
    mu, std = np.asarray(mu, float), np.asarray(std, float)
    noise = np.mean(sigma_n) if np.iterable(sigma_n) else sigma_n
    var = std**2 - noise**2
    mask = (var > 0) & np.isfinite(mu)
    values = np.full_like(std, -np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        values[mask] = 2 * zeta * (mu[mask] - y_max) + np.log(
            np.sqrt(np.clip(std[mask]**2 - noise**2, 0.0, None)))
    return values


def test_logexp_golden_vs_reference_grid():
    """Golden-value parity with the reference over a (mu, sigma, sigma_n)
    grid, including per-point noise arrays (VERDICT round-1 item 3)."""
    zeta = 4 ** (-0.85)
    acq = LogExp(zeta=zeta)
    mus = np.array([-50.0, -5.0, -0.1, 0.0, 3.0, -np.inf, np.nan])
    stds = np.array([1e-4, 5e-3, 1e-2, 2e-2, 0.3, 1.0, 10.0])
    for sigma_n in (1e-2, 0.1, np.full(7, 1e-2),
                    np.array([1e-3, 1e-2, 0.3])):
        mu_g, std_g = np.meshgrid(mus, stds)
        mu_g, std_g = mu_g.ravel(), std_g.ravel()
        for y_max in (0.0, 3.0):
            got = np.asarray(acq.values(
                jnp.asarray(mu_g), jnp.asarray(std_g), y_max,
                float(np.mean(sigma_n))))
            want = _reference_logexp(mu_g, std_g, y_max, sigma_n, zeta)
            np.testing.assert_allclose(got, want, rtol=1e-12)


def test_engines_agree_on_acquisition_values(rng):
    """NORA's acq_fn and BatchOptimizer's _acq_values_gated must produce
    bitwise-identical acquisition values on the same surrogate (they had
    three noise conventions in round 1)."""
    from gpry_tpu.acquisition.batch_optimizer import _acq_values_gated
    gpr = make_fitted_gpr(rng)
    # inject per-point noise so the convention actually matters
    Xn = rng.uniform(size=(4, 2))
    yn = -0.5 * 25.0 * np.sum((Xn - 0.5)**2, axis=1)
    gpr.append_to_data(Xn, yn, noise_level=np.full(4, 0.05),
                       fit_gpr="simple")
    p = gpr.surrogate_params()
    cand = rng.uniform(size=(256, 2))
    mu, sd = surrogate_predict(gpr.family, p, jnp.asarray(cand, p.X.dtype))
    zeta = 2 ** (-0.85)
    acq_obj = LogExp(zeta=zeta)
    noise_std = float(np.mean(gpr.noise_level))
    # NORA's path (acquisition/nora.py multi_add step 3)
    vals_nora = np.asarray(acq_obj.values(mu, sd, gpr.y_max, noise_std))
    # BatchOptimizer's jitted gated path
    vals_bo = np.asarray(_acq_values_gated(
        gpr.family, p, zeta, noise_std, jnp.asarray(cand, p.X.dtype)))
    finite = np.isfinite(vals_nora)
    assert np.array_equal(finite, np.isfinite(vals_bo))
    np.testing.assert_allclose(vals_nora[finite], vals_bo[finite],
                               rtol=1e-12, atol=0)
    # and both match the reference formula
    want = _reference_logexp(np.asarray(mu), np.asarray(sd),
                             float(gpr.y_max), gpr.noise_level, zeta)
    np.testing.assert_allclose(vals_nora[finite], want[finite], rtol=1e-10)


def test_logexp_auto_zeta():
    """zeta = d**-0.85 by default (gpry/acquisition_functions.py:906-934)."""
    acq = LogExp(dimension=8)
    assert np.isclose(acq.zeta, 8 ** (-0.85))
    acq2 = LogExp(dimension=8, zeta_scaling=0.5)
    assert np.isclose(acq2.zeta, 8 ** (-0.5))


def test_batch_optimizer_proposes_good_points(rng):
    gpr = make_fitted_gpr(rng)
    engine = BatchOptimizer(gpr.bounds, acq_func={"LogExp": {"dimension": 2}},
                            random_state=7)
    X, y_lies, acq_vals = engine.multi_add(gpr, n_points=3, rng=rng)
    assert X.shape == (3, 2)
    # all in bounds, finite acquisition, no duplicates
    assert np.all((X >= 0) & (X <= 1))
    assert np.all(np.isfinite(acq_vals))
    assert len(np.unique(X.round(6), axis=0)) == 3
    # proposals should beat random candidates on the acquisition
    from gpry_tpu.acquisition.batch_optimizer import _acq_values_gated
    p = gpr.surrogate_params()
    rand = rng.uniform(size=(2000, 2))
    acq_rand = np.asarray(_acq_values_gated(
        gpr.family, p, engine.acq_func.zeta,
        float(gpr.noise_level), jnp.asarray(rand, p.X.dtype)))
    assert acq_vals[0] >= np.max(acq_rand) - 0.2


def test_ranked_pool_bulk_matches_sequential_conditioning(rng):
    """The pool head must equal greedy sequential conditioning by hand."""
    gpr = make_fitted_gpr(rng)
    p0 = gpr.surrogate_params()
    noise_var = float(gpr.noise_level) ** 2
    zeta = 2 ** (-0.85)

    def acq_fn(y, s):
        var = s * s - noise_var
        ok = (var > 0) & np.isfinite(y)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = 2 * zeta * (y - gpr.y_max) + 0.5 * np.log(
                np.where(ok, var, 1.0))
        return np.where(ok, vals, -np.inf)

    cand = rng.uniform(size=(500, 2))
    mu, sd = surrogate_predict(gpr.family, p0, jnp.asarray(cand, p0.X.dtype))
    mu, sd = np.asarray(mu), np.asarray(sd)
    pool = RankedPool(3, gpr, acq_fn)
    pool.add(cand, y=mu, sigma=sd, method="bulk")
    X_sel, y_sel, acq_sel = pool.get()

    # hand-rolled greedy Kriging-believer
    p = p0
    Xr, yr, sr = cand.copy(), mu.copy(), sd.copy()
    expected = []
    for i in range(3):
        if i == 0:
            a = acq_fn(yr, sr)
        else:
            _, s_c = surrogate_predict(gpr.family, p,
                                       jnp.asarray(Xr, p.X.dtype))
            a = acq_fn(yr, np.asarray(s_c))
        j = int(np.argmax(a))
        expected.append(Xr[j])
        p = append_lie(gpr.family, p, jnp.asarray(Xr[j][None], p.X.dtype),
                       jnp.asarray([yr[j]], p.X.dtype))
        keep = np.ones(len(yr), dtype=bool)
        keep[j] = False
        Xr, yr, sr = Xr[keep], yr[keep], sr[keep]
    assert np.allclose(X_sel, np.array(expected))
    # conditioned acq must be non-increasing down the pool
    assert np.all(np.diff(acq_sel) <= 1e-9)


def test_append_lie_grows_full_bucket(rng):
    """With n exactly at the bucket size, Kriging-believer conditioning must
    grow the buffers instead of silently dropping the append (ADVICE r1)."""
    from gpry_tpu import config
    n = config.bucket_size(1)          # smallest bucket, filled exactly
    gpr = make_fitted_gpr(rng, d=2, n=n)
    p = gpr.surrogate_params()
    assert int(p.n) == n == p.X.shape[0]
    x_new = np.array([[0.31, 0.62]])
    _, sd_before = surrogate_predict(gpr.family, p,
                                     jnp.asarray(x_new, p.X.dtype))
    p2 = append_lie(gpr.family, p, jnp.asarray(x_new, p.X.dtype),
                    jnp.asarray([-1.0], p.X.dtype))
    assert int(p2.n) == n + 1
    assert p2.X.shape[0] > n
    # conditioning must actually take effect (not a dropped scatter):
    # std at the lie strictly decreases ...
    _, sd_after = surrogate_predict(gpr.family, p2,
                                    jnp.asarray(x_new, p2.X.dtype))
    assert float(sd_after[0]) < 0.999 * float(sd_before[0])
    # ... and the grown factorization matches a from-scratch refactorized
    # model carrying the same appended point (fit_classifier=False keeps
    # the preprocessors, hence theta's coordinates, unchanged)
    import copy
    gpr2 = copy.deepcopy(gpr)
    gpr2.append_to_data(x_new, [-1.0], fit_gpr=False, fit_classifier=False)
    x_probe = rng.uniform(size=(8, 2))
    mu_a, sd_a = surrogate_predict(gpr.family, p2,
                                   jnp.asarray(x_probe, p2.X.dtype))
    mu_b, sd_b = gpr2.predict(x_probe, return_std=True)
    # loose tolerance: incremental append vs full refactorization differ
    # at ~1e-5 rel near-singular Schur complements, ample for believer lies
    # (a dropped append would diverge by O(1))
    np.testing.assert_allclose(np.asarray(mu_a), mu_b, rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd_a), sd_b, rtol=1e-3,
                               atol=1e-6)


def test_nora_multi_add(rng):
    gpr = make_fitted_gpr(rng)
    engine = NORA(gpr.bounds, acq_func={"LogExp": {"dimension": 2}},
                  nlive_max=100, num_repeats=10, rng=rng, verbose=1)
    X, y_lies, acq_vals = engine.multi_add(gpr, n_points=3, rng=rng)
    assert X.shape[1] == 2 and 1 <= len(X) <= 3
    assert np.all((X >= 0) & (X <= 1))
    assert np.all(np.isfinite(acq_vals))
    # mean/cov estimates derived from the NS sample
    assert engine.mean is not None and engine.mean.shape == (2,)
    assert engine.cov.shape == (2, 2)
    # second call reuses + reweights the sample (no fresh NS unless due)
    X2, _, _ = engine.multi_add(gpr, n_points=2, rng=rng)
    # proposed points are excluded from the reused sample
    for x in X2:
        assert not np.any(np.all(np.isclose(X, x), axis=1))


def test_ranked_pool_fused_device_fill_matches_host_loop(rng):
    """The single-device fused bulk fill (_bulk_fill_device) must select
    the same Kriging-believer batch as the per-round host loop."""
    from gpry_tpu.parallel.mesh import mesh_disabled
    gpr = make_fitted_gpr(rng)
    p0 = gpr.surrogate_params()
    acq_obj = LogExp(zeta=2 ** (-0.85))
    noise_std = float(np.mean(gpr.noise_level))

    def acq_fn(y, s):
        return np.asarray(acq_obj.values(jnp.asarray(y), jnp.asarray(s),
                                         gpr.y_max, noise_std))

    cand = rng.uniform(size=(500, 2))
    mu, sd = surrogate_predict(gpr.family, p0, jnp.asarray(cand, p0.X.dtype))
    mu, sd = np.asarray(mu), np.asarray(sd)

    pool_host = RankedPool(4, gpr, acq_fn)   # no acqf -> host loop
    pool_host.add(cand, y=mu, sigma=sd, method="bulk")
    Xh, yh, ah = pool_host.get()

    with mesh_disabled():   # single-device path -> fused program
        pool_dev = RankedPool(4, gpr, acq_fn, acqf=acq_obj)
        pool_dev.add(cand, y=mu, sigma=sd, method="bulk")
    Xd, yd, ad = pool_dev.get()

    assert np.allclose(Xd, Xh)
    assert np.allclose(yd, yh)
    assert np.allclose(ad, ah, rtol=1e-6, atol=1e-8)
    assert np.all(np.diff(ad) <= 1e-9)
