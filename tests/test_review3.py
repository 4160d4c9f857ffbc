"""
Third self-review pass (round 3): keep_min_finite guarantee with -inf
values present, n_restarts_optimizer=0 honored, seeded convergence
fallback MCMC, fit-ladder bucket-crossing state coherence, and initial
training batch sizing.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from model_generator import random_gaussian  # noqa: E402

from gpry_tpu.models import GaussianProcessRegressor  # noqa: E402


def test_keep_min_finite_with_infinities(rng):
    """With fewer than keep_min_finite finite points amid -inf values the
    threshold must blow up (reference gpr.py:1476-1488 semantics) so that
    EVERY finite point stays in the training set — not collapse back to
    the base threshold and train on a single point."""
    bounds = np.array([[-5.0, 5.0]] * 4)
    gpr = GaussianProcessRegressor(bounds=bounds, account_for_inf="SVM",
                                   random_state=0)
    assert gpr.keep_min_finite >= 3
    X = rng.uniform(-5, 5, size=(4, 4))
    # spread y over far more than the base threshold (~210 nats at d=4),
    # plus one -inf: the nth-highest-over-all-y is -inf
    y = np.array([0.0, -500.0, -800.0, -np.inf])
    gpr.append_to_data(X, y)
    assert gpr._diff_threshold_keep_n() == np.inf
    assert gpr.n == 3, (gpr.n, "all finite points must stay finite")
    assert gpr.n_total == 4


def test_zero_restarts_config_honored(rng):
    """gpr={'n_restarts_optimizer': 0} must disable hyperparameter
    re-optimization (the old falsy-zero fallback silently replaced it
    with the 10+2d default)."""
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=51)
    # fit_simple_every is a separate cadence control (single-start refits
    # regardless of n_restarts_optimizer); disable it to freeze theta fully
    runner = Runner(m.loglike, bounds=m.bounds, seed=51, verbose=0,
                    gpr={"kernel": "RBF", "n_restarts_optimizer": 0},
                    options={"max_total": 10, "max_initial": 8,
                             "fit_simple_every": False},
                    convergence_criterion="DontConverge")
    assert runner._fit_restarts() == 0
    theta0 = np.copy(runner.gpr._theta)
    with pytest.warns(UserWarning, match="zero restarts"):
        runner.run()
    # hyperparameters never moved from their initialization
    assert np.allclose(runner.gpr._theta, theta0)

    # prebuilt-instance path: the GPR's own attribute is picked up
    gpr = GaussianProcessRegressor(bounds=m.bounds, n_restarts_optimizer=7,
                                   random_state=1)
    runner2 = Runner(m.loglike, bounds=m.bounds, seed=52, verbose=0,
                     gpr=gpr, options={"max_total": 8})
    assert runner2._fit_restarts() == 7


def test_convergence_mcmc_rides_runner_rng(rng):
    """Identically-seeded runs must produce identical convergence-check
    mean/cov estimates: the criteria's fallback MCMC rides the Runner's
    seeded RNG stream (was: fresh OS entropy per check)."""
    from gpry_tpu.convergence import GaussianKL
    from gpry_tpu.run import Runner
    m = random_gaussian(d=2, rng=61)
    r1 = Runner(m.loglike, bounds=m.bounds, seed=9, verbose=0,
                convergence_criterion="GaussianKL",
                options={"max_total": 12, "max_initial": 10})
    r1.do_initial_training()
    r2 = Runner(m.loglike, bounds=m.bounds, seed=9, verbose=0,
                convergence_criterion="GaussianKL",
                options={"max_total": 12, "max_initial": 10})
    r2.do_initial_training()
    cc1, cc2 = r1.convergence_criterion[0], r2.convergence_criterion[0]
    assert isinstance(cc1, GaussianKL) and cc1.rng is r1.rng
    m1, c1 = cc1._get_new_mean_and_cov(r1.gpr)
    m2, c2 = cc2._get_new_mean_and_cov(r2.gpr)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(c1, c2)


def test_initial_training_batch_sized_to_deficit(rng):
    """Top-up batches after the first must be sized to the remaining
    deficit (truth calls are the expensive resource), and the max_initial
    budget must not be overshot by a full batch."""
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=71)
    sizes = []

    def loglike(x):
        # first full batch: all -inf; afterwards finite
        return -np.inf if len(sizes) and sizes[0] >= 8 and \
            sum(sizes) <= 8 else m.loglike(x)

    runner = Runner(m.loglike, bounds=m.bounds, seed=71, verbose=0,
                    options={"n_initial": 8, "max_initial": 40})
    orig = runner.initial_proposer.get_batch

    def traced(n, rng_):
        sizes.append(n)
        return orig(n, rng_)

    runner.initial_proposer.get_batch = traced
    # make first batch partially infinite: wrap the executor instead
    orig_logp = runner.executor.logp_batch

    def gated(X):
        y = orig_logp(X)
        if len(sizes) == 1:
            y = np.asarray(y, dtype=float)
            y[: max(1, len(y) - 3)] = -np.inf   # leave only 3 finite
        return y

    runner.executor.logp_batch = gated
    runner.do_initial_training()
    assert sizes[0] == 8
    # deficit after batch 1 is 5 -> the next batch asks for ~5, not 8
    assert len(sizes) >= 2 and sizes[1] == 5, sizes
    assert sum(sizes) <= 40


def test_bucket_crossing_failure_leaves_coherent_state(rng):
    """If the hyperparameter fit dies after a bucket crossing (all
    restarts non-finite), the GPR must be left in a coherent 'prior'
    state — predict() must not crash on shape-mismatched (X, L)."""
    from gpry_tpu import config

    bounds = np.array([[-1.0, 1.0]] * 2)
    gpr = GaussianProcessRegressor(bounds=bounds, random_state=0,
                                   n_restarts_optimizer=2)
    X = rng.uniform(-1, 1, size=(20, 2))
    y = -np.sum(X**2, axis=1)
    gpr.append_to_data(X, y)
    nmax0 = gpr._nmax
    assert gpr._dL.shape[0] == nmax0

    # append past the bucket boundary with a FULL fit forced to fail:
    # append_to_data dispatches straight into fit_gpr_hyperparameters,
    # which rebuckets _dX/_dy BEFORE searching — the old _dL (old bucket)
    # must be dropped, not left shape-mismatched, when the search raises
    from gpry_tpu.parallel import mesh as mesh_mod
    orig_fit = mesh_mod.fit_theta_restarts_maybe_sharded

    def fail_fit(*a, **k):
        import jax.numpy as jnp
        th, nll, nev = orig_fit(*a, **k)
        return th, jnp.full_like(nll, jnp.nan), nev

    n_more = nmax0 - gpr.n + 1
    X2 = rng.uniform(-1, 1, size=(n_more, 2))
    mesh_mod.fit_theta_restarts_maybe_sharded = fail_fit
    try:
        with pytest.raises(np.linalg.LinAlgError):
            gpr.append_to_data(X2, -np.sum(X2**2, axis=1),
                               fit_gpr={"n_restarts": 2})
    finally:
        mesh_mod.fit_theta_restarts_maybe_sharded = orig_fit
    assert gpr._nmax > nmax0
    # coherent degraded state: no stale mismatched factorization
    assert gpr._dL is None
    out = gpr.predict(X[:3])          # prior fallback, no crash
    assert out.shape == (3,)
    # a successful refit restores full function
    gpr.fit_gpr_hyperparameters()
    assert gpr._dL is not None and gpr._dL.shape[0] == gpr._nmax
    del config
