"""
Kernel-library parity vs scikit-learn (reference kernel surface:
gpry/kernels.py:213-702 — RBF/Matern + RationalQuadratic/ExpSineSquared/
DotProduct/WhiteKernel/ConstantKernel and Sum/Product/Exponentiation).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.gaussian_process import GaussianProcessRegressor as SkGPR
from sklearn.gaussian_process import kernels as SK

from gpry_tpu.models.gp import GaussianProcessRegressor
from gpry_tpu.ops.kernels import (build_kernel_spec, spec_cross, spec_diag,
                                  spec_n_params)


def _compare(spec_dict, sk_kernel, d, rng, rtol=1e-10):
    spec, theta0, bounds = build_kernel_spec(spec_dict, d)
    assert len(theta0) == spec_n_params(spec) == len(sk_kernel.theta)
    np.testing.assert_allclose(theta0, sk_kernel.theta, rtol=1e-12)
    X1 = rng.uniform(-1, 2, size=(13, d))
    X2 = rng.uniform(-1, 2, size=(7, d))
    theta = jnp.asarray(theta0)
    K = np.asarray(spec_cross(spec, theta, jnp.asarray(X1),
                              jnp.asarray(X2)))
    np.testing.assert_allclose(K, sk_kernel(X1, X2), rtol=rtol, atol=1e-12)
    Kself = np.asarray(spec_cross(spec, theta, jnp.asarray(X1),
                                  jnp.asarray(X1)))
    np.testing.assert_allclose(Kself, sk_kernel(X1, X1), rtol=rtol,
                               atol=1e-12)
    diag = np.asarray(spec_diag(spec, theta, jnp.asarray(X1)))
    np.testing.assert_allclose(diag, sk_kernel.diag(X1), rtol=rtol,
                               atol=1e-12)
    # bounds collected per hyperparameter
    assert np.asarray(bounds).shape == (len(theta0), 2)


def test_rbf_ard_matches_sklearn(rng):
    ls = [0.5, 0.8, 1.3]
    _compare({"RBF": {"length_scale": ls}}, SK.RBF(length_scale=ls), 3, rng)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_matches_sklearn(rng, nu):
    ls = [0.6, 1.1]
    _compare({"Matern": {"nu": nu, "length_scale": ls}},
             SK.Matern(length_scale=ls, nu=nu), 2, rng, rtol=1e-8)


def test_rational_quadratic_matches_sklearn(rng):
    _compare({"RationalQuadratic": {"alpha": 1.3, "length_scale": 0.7}},
             SK.RationalQuadratic(alpha=1.3, length_scale=0.7), 2, rng)


def test_expsinesquared_matches_sklearn(rng):
    _compare({"ExpSineSquared": {"length_scale": 0.5, "periodicity": 2.0}},
             SK.ExpSineSquared(length_scale=0.5, periodicity=2.0), 2, rng)


def test_dotproduct_matches_sklearn(rng):
    _compare({"DotProduct": {"sigma_0": 1.5}}, SK.DotProduct(sigma_0=1.5),
             3, rng)


def test_white_and_constant_match_sklearn(rng):
    _compare({"WhiteKernel": {"noise_level": 0.3}},
             SK.WhiteKernel(noise_level=0.3), 2, rng)
    _compare({"ConstantKernel": {"constant_value": 2.0}},
             SK.ConstantKernel(constant_value=2.0), 2, rng)


def test_operators_match_sklearn(rng):
    """C() * RBF + WhiteKernel, and RBF ** 2 (Sum/Product/Exponentiation,
    reference gpry/kernels.py:623-699)."""
    composite = {"Sum": [
        {"Product": [{"ConstantKernel": {"constant_value": 2.0}},
                     {"RBF": {"length_scale": [0.5, 0.7]}}]},
        {"WhiteKernel": {"noise_level": 0.1}}]}
    sk = SK.ConstantKernel(2.0) * SK.RBF([0.5, 0.7]) + SK.WhiteKernel(0.1)
    _compare(composite, sk, 2, rng)
    _compare({"Exponentiation": {"kernel": {"RBF": {"length_scale": [0.4,
                                                                     0.9]}},
                                 "exponent": 2.0}},
             SK.RBF([0.4, 0.9]) ** 2.0, 2, rng)


def test_gpr_with_spec_kernel_matches_sklearn_gpr(rng):
    """Full GPR prediction parity at fixed hyperparameters: the padded
    device core with a composite spec kernel (incl. WhiteKernel) must match
    sklearn's GPR mean and std exactly."""
    d, n = 2, 30
    bounds = np.array([[-1.0, 2.0]] * d)
    X = rng.uniform(-1, 2, size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.5 * np.cos(2 * X[:, 1])
    Xq = rng.uniform(-1, 2, size=(15, d))

    sk_kernel = SK.ConstantKernel(1.7) * SK.RationalQuadratic(
        length_scale=0.8, alpha=1.2) + SK.WhiteKernel(noise_level=0.05)
    sk = SkGPR(kernel=sk_kernel, alpha=1e-2, optimizer=None).fit(X, y)
    mu_sk, sd_sk = sk.predict(Xq, return_std=True)

    spec = {"Sum": [
        {"Product": [{"ConstantKernel": {"constant_value": 1.7}},
                     {"RationalQuadratic": {"length_scale": 0.8,
                                            "alpha": 1.2}}]},
        {"WhiteKernel": {"noise_level": 0.05}}]}
    gpr = GaussianProcessRegressor(
        kernel=spec, bounds=bounds, noise_level=0.1, account_for_inf=None,
        clip_factor=None)
    gpr.append_to_data(X, y, fit_gpr=False)
    mu, sd = gpr.predict(Xq, return_std=True)
    np.testing.assert_allclose(mu, mu_sk, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sd, sd_sk, rtol=1e-6, atol=1e-9)


def test_gpr_spec_kernel_end_to_end_fit(rng):
    """An extended kernel fits its hyperparameters through the standard
    vmapped L-BFGS path and tracks a smooth target."""
    d, n = 2, 40
    bounds = np.array([[0.0, 1.0]] * d)
    X = rng.uniform(size=(n, d))
    y = -0.5 * 25 * np.sum((X - 0.5) ** 2, axis=1)
    spec = {"Product": [
        {"ConstantKernel": {"constant_value": 1.0,
                            "constant_value_bounds": (1e-3, 1e3)}},
        {"RationalQuadratic": {"alpha": 1.0, "length_scale": 0.3,
                               "alpha_bounds": (1e-2, 1e2),
                               "length_scale_bounds": (1e-2, 10.0)}}]}
    from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y
    gpr = GaussianProcessRegressor(
        kernel=spec, bounds=bounds,
        preprocessing_X=Normalize_bounds(bounds), preprocessing_y=
        Normalize_y(), n_restarts_optimizer=6, random_state=3)
    gpr.append_to_data(X, y, fit_gpr={"n_restarts": 6})
    Xq = rng.uniform(size=(20, d))
    yq = -0.5 * 25 * np.sum((Xq - 0.5) ** 2, axis=1)
    mu, sd = gpr.predict(Xq, return_std=True)
    err = np.abs(mu - yq)
    assert np.median(err) < 0.5, (np.median(err), err.max())
    # and the believer-append path works with spec kernels
    gpr.append_to_data(Xq[:2], yq[:2], fit_gpr=False,
                       fit_classifier=False)
    mu2 = gpr.predict(Xq[:2])
    np.testing.assert_allclose(mu2, yq[:2], atol=0.3)
