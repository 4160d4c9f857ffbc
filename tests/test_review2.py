"""
Second self-review pass (round 3): generic acquisition functions in the
BatchOptimizer, NORA empty-sample robustness, predict(return_cov) white-
kernel diagonal consistency, sigma_n override, gradient protocol of the
operator functions, InterfaceDevice plain-callable support, and MC rng
defaults.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from model_generator import random_gaussian  # noqa: E402

from gpry_tpu.models import GaussianProcessRegressor  # noqa: E402
from gpry_tpu.models.preprocessing import (Normalize_bounds,  # noqa: E402
                                           Normalize_y)


def _fitted_gpr(rng, d=2, n=25, kernel="RBF"):
    bounds = np.array([[-2.0, 2.0]] * d)
    X = rng.uniform(-2, 2, size=(n, d))
    y = -0.5 * np.sum(((X - 0.3) / 0.6) ** 2, axis=1)
    gpr = GaussianProcessRegressor(
        bounds=bounds, kernel=kernel,
        preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), n_restarts_optimizer=6,
        random_state=0)
    gpr.append_to_data(X, y)
    return gpr, bounds


# ---------------------------------------------------------------------------
# BatchOptimizer honors the configured acquisition function
# ---------------------------------------------------------------------------

def test_batch_optimizer_generic_acq_func(rng):
    """A non-LogExp acq_func must be what the engine actually evaluates:
    for Mu, the returned acquisition values are the surrogate mean at the
    proposals (they used to be LogExp values regardless of config)."""
    from gpry_tpu.acquisition.batch_optimizer import BatchOptimizer

    gpr, bounds = _fitted_gpr(rng)
    bo = BatchOptimizer(bounds, acq_func="Mu", n_restarts_optimizer=4)
    X_out, y_lies, acq = bo.multi_add(gpr, n_points=2, rng=rng)
    assert X_out.shape == (2, 2)
    mu0 = gpr.predict(X_out[:1])[0]
    # first point is ranked against the UNCONDITIONED surrogate: its acq
    # value must be the mean itself, not the LogExp formula
    assert np.isclose(acq[0], mu0, rtol=1e-5, atol=1e-8), (acq[0], mu0)
    # pure exploitation: the proposal's mean beats (nearly) every random
    # candidate's — LogExp would chase high-std regions instead
    Xr = rng.uniform(-2, 2, size=(2000, 2))
    mu_r = gpr.predict(Xr)
    assert mu0 >= np.quantile(mu_r[np.isfinite(mu_r)], 0.999) - 1e-6


def test_batch_optimizer_expected_improvement_runs(rng):
    from gpry_tpu.acquisition.batch_optimizer import BatchOptimizer

    gpr, bounds = _fitted_gpr(rng)
    bo = BatchOptimizer(bounds, acq_func={"ExpectedImprovement": {}},
                        n_restarts_optimizer=4)
    X_out, _, acq = bo.multi_add(gpr, n_points=2, rng=rng)
    assert np.all(np.isfinite(acq))
    assert np.all((X_out >= bounds[:, 0]) & (X_out <= bounds[:, 1]))


def test_engines_honor_sigma_n_override(rng):
    """LogExp(sigma_n=...) must reach the engine's noise convention: a
    sigma_n above every posterior std gates the whole space to -inf."""
    from gpry_tpu.acquisition.batch_optimizer import BatchOptimizer
    from gpry_tpu.acquisition.functions import LogExp

    gpr, bounds = _fitted_gpr(rng)
    big = LogExp(dimension=2, sigma_n=1e3)
    assert big._noise_std(gpr) == 1e3
    bo = BatchOptimizer(bounds, acq_func=big, n_restarts_optimizer=4)
    _, _, acq = bo.multi_add(gpr, n_points=1, rng=rng)
    assert np.all(acq == -np.inf)


# ---------------------------------------------------------------------------
# NORA: degenerate (all-gated) NS sample returns an empty proposal
# ---------------------------------------------------------------------------

def test_nora_empty_ns_sample_returns_empty(rng):
    from gpry_tpu.acquisition.nora import NORA

    gpr, bounds = _fitted_gpr(rng)
    nora = NORA(bounds, mc_every=10, rng=rng, verbose=0)

    def empty_ns(gpr):
        nora.last_MC_X = np.empty((0, 2))
        nora.last_MC_logp = np.empty(0)
        nora.last_MC_logw = np.empty(0)
        nora.last_MC_sigma = np.empty(0)

    nora._run_ns = empty_ns
    X, y, acq = nora.multi_add(gpr, n_points=3)
    assert len(X) == 0 and len(y) == 0 and len(acq) == 0
    with pytest.raises(ValueError, match="empty"):
        nora.last_MC_sample()

    # all-(-inf) weights behave the same as empty
    def allinf_ns(gpr):
        nora.last_MC_X = np.zeros((5, 2))
        nora.last_MC_logp = np.full(5, -np.inf)
        nora.last_MC_logw = np.full(5, -np.inf)
        nora.last_MC_sigma = np.zeros(5)

    nora._run_ns = allinf_ns
    nora._iter_since_mc = None
    X, y, acq = nora.multi_add(gpr, n_points=3)
    assert len(X) == 0


# ---------------------------------------------------------------------------
# predict(return_cov) diagonal == predict(return_std)^2 for White kernels
# ---------------------------------------------------------------------------

def test_return_cov_diag_matches_std_with_white_kernel(rng):
    kernel = {"Sum": [{"RBF": {}}, {"WhiteKernel": {"noise_level": 0.05}}]}
    gpr, _ = _fitted_gpr(rng, kernel=kernel)
    Xq = rng.uniform(-1, 1, size=(6, 2))
    _, cov = gpr.predict(Xq, return_cov=True)
    _, std = gpr.predict(Xq, return_std=True)
    assert np.allclose(np.diag(cov), std**2, rtol=1e-6, atol=1e-10)


# ---------------------------------------------------------------------------
# Acquisition-function protocol: builtin_names + gradients
# ---------------------------------------------------------------------------

def test_builtin_names_complete_and_public():
    from gpry_tpu.acquisition.functions import builtin_names

    names = builtin_names()
    for want in ("LogExp", "NonlinearLogExp", "Mu", "Std", "ExponentialMu",
                 "ExponentialStd", "ExpectedImprovement", "Sum", "Product",
                 "Exponentiation", "ConstantAcqFunc"):
        assert want in names, want
    assert not any(n.startswith("_") for n in names)


def test_operator_gradients_finite_difference(rng):
    """Sum/Product/Exponentiation/EI/ExponentialMu gradients must match
    numerical differentiation of their __call__ values.  (LogExp itself is
    excluded: it reproduces the reference's gradient, which is documented
    as inconsistent with its values when sigma_n > 0.)

    The GP is kept SMALL and the query point away from the data: at a
    densely-sampled interior point the posterior std collapses to ~1e-5 of
    the prior scale and BOTH finite differences and autodiff of
    ``prior_var - quad`` are cancellation noise (verified: jacfwd==jacrev
    there while FD scatters) — that regime tests conditioning, not code."""
    from gpry_tpu.acquisition import functions as fns

    gpr, _ = _fitted_gpr(rng, n=8)
    x0 = np.array([1.3, -1.1])
    candidates = [
        fns.Mu(), fns.Std(), fns.ExponentialMu(), fns.ExponentialStd(),
        fns.ExpectedImprovement(),
        fns.Sum(fns.Mu(), fns.Std()),
        fns.Product(fns.Mu(), fns.Mu()),
        fns.Exponentiation(fns.Std(), 2.0),
    ]
    eps = 1e-5
    for acqf in candidates:
        assert acqf.hasgradient
        vals, g = acqf(x0[None], gpr, eval_gradient=True)
        g_num = np.empty(2)
        for k in range(2):
            dx = np.zeros(2)
            dx[k] = eps
            vp = acqf((x0 + dx)[None], gpr)[0]
            vm = acqf((x0 - dx)[None], gpr)[0]
            g_num[k] = (vp - vm) / (2 * eps)
        assert np.allclose(np.asarray(g).ravel(), g_num, rtol=2e-3,
                           atol=1e-5), (type(acqf).__name__, g, g_num)


def test_exponentiation_delegates_hasgradient():
    from gpry_tpu.acquisition import functions as fns

    assert fns.Exponentiation(fns.Mu(), 2.0).hasgradient is True
    assert fns.Exponentiation(fns.NonlinearLogExp(dimension=2),
                              2.0).hasgradient is False


# ---------------------------------------------------------------------------
# InterfaceDevice accepts a plain callable (host-callback wrap)
# ---------------------------------------------------------------------------

def test_interface_device_plain_callable():
    from gpry_tpu.mc.interfaces import InterfaceDevice

    iface = InterfaceDevice(verbose=0, rng=3)
    bounds = np.array([[-4.0, 4.0]] * 2)
    iface.set_prior(bounds)
    iface.set_precision(nlive=60, num_repeats=10, precision_criterion=0.05)
    calls = []

    def logp(X):
        X = np.atleast_2d(X)
        calls.append(len(X))
        return -0.5 * np.sum(((X - [0.5, -0.5]) / 0.4) ** 2, axis=1)

    res = iface.run(logp)
    assert calls, "host callable was never invoked"
    w = res["weights"] / res["weights"].sum()
    mean = w @ res["X"]
    assert np.allclose(mean, [0.5, -0.5], atol=0.15), mean


# ---------------------------------------------------------------------------
# MC sampler rng default: fresh entropy, not a fixed key
# ---------------------------------------------------------------------------

def test_mc_sample_default_rng_not_fixed(rng):
    from gpry_tpu.mc import mc_sample_from_gp

    gpr, _ = _fitted_gpr(rng)
    # refine=False: this test pins the RAW sampler's RNG behavior; the
    # round-4 IS refinement's output size is intentionally stochastic
    # (box-rejection counts + ESS gate), so shapes need not match with
    # it on.
    s1 = mc_sample_from_gp(gpr, sampler="mcmc",
                           options={"n_steps": 100, "n_chains": 4,
                                    "refine": False})
    s2 = mc_sample_from_gp(gpr, sampler="mcmc",
                           options={"n_steps": 100, "n_chains": 4,
                                    "refine": False})
    assert s1["X"].shape == s2["X"].shape
    assert not np.array_equal(s1["X"], s2["X"])
