"""
Synthetic likelihood fixtures, mirroring the reference's test models
(reference: tests/model_generator.py:33-291) as plain callables + bounds
(no Cobaya dependency).
"""

import numpy as np
from scipy.stats import invwishart


class SyntheticModel:
    """A log-likelihood callable with bounds and (if known) mean/cov.

    ``loglike_vec``, when provided, evaluates a whole (N, d) batch to an
    (N,) array — used by benchmark ground-truth quadrature/sampling to
    avoid per-row Python overhead.
    """

    def __init__(self, loglike, bounds, mean=None, cov=None, name=None,
                 loglike_vec=None):
        self.loglike = loglike
        self.bounds = np.asarray(bounds, dtype=float)
        self.mean = mean
        self.cov = cov
        self.name = name or "synthetic"
        self.loglike_vec = loglike_vec

    @property
    def d(self):
        return self.bounds.shape[0]

    def __call__(self, x):
        return self.loglike(np.asarray(x))

    def loglike_batch(self, X):
        """(N, d) -> (N,), vectorized when the fixture provides it."""
        X = np.atleast_2d(np.asarray(X, dtype=float))
        if self.loglike_vec is not None:
            return np.asarray(self.loglike_vec(X), dtype=float)
        return np.array([self.loglike(x) for x in X], dtype=float)


def random_gaussian(d=2, prior_size_in_std=5.0, rng=None):
    """Random correlated Gaussian (reference: tests/model_generator.py:33)."""
    rng = rng if isinstance(rng, np.random.Generator) \
        else np.random.default_rng(rng)
    std = rng.uniform(0.5, 2.0, size=d)
    cov = invwishart.rvs(df=d + 4, scale=np.diag(std**2) * (d + 4),
                         random_state=np.random.RandomState(
                             rng.integers(2**31)))
    cov = np.atleast_2d(cov)
    mean = rng.uniform(-1, 1, size=d)
    inv = np.linalg.inv(cov)
    stds = np.sqrt(np.diag(cov))
    bounds = np.stack([mean - prior_size_in_std * stds,
                       mean + prior_size_in_std * stds], axis=1)

    def loglike(x):
        diff = np.atleast_1d(x) - mean
        return float(-0.5 * diff @ inv @ diff)

    def loglike_vec(X):
        diff = np.atleast_2d(X) - mean
        return -0.5 * np.einsum("ni,ij,nj->n", diff, inv, diff)

    return SyntheticModel(loglike, bounds, mean=mean, cov=cov,
                          name=f"gaussian_d{d}", loglike_vec=loglike_vec)


def loggaussian(d=4, d_log=2, prior_size_in_std=5.0, rng=None):
    """Random Gaussian with the first ``d_log`` directions in log-scale
    (the likelihood exponentiates them: x -> 10**x), mean 0
    (reference: tests/model_generator.py:84-111)."""
    rng = rng if isinstance(rng, np.random.Generator) \
        else np.random.default_rng(rng)
    assert d >= d_log
    std = rng.uniform(0.5, 2.0, size=d)
    cov = invwishart.rvs(df=d + 4, scale=np.diag(std**2) * (d + 4),
                         random_state=np.random.RandomState(
                             rng.integers(2**31)))
    cov = np.atleast_2d(cov)
    mean = np.zeros(d)
    inv = np.linalg.inv(cov)
    stds = np.sqrt(np.diag(cov))
    bounds = np.stack([-prior_size_in_std * stds,
                       prior_size_in_std * stds], axis=1)
    log_norm = -0.5 * (d * np.log(2 * np.pi)
                       + np.linalg.slogdet(cov)[1])

    def loglike(x):
        z = np.array(np.atleast_1d(x), dtype=float)
        z[:d_log] = 10.0 ** z[:d_log]
        diff = z - mean
        return float(log_norm - 0.5 * diff @ inv @ diff)

    def loglike_vec(X):
        Z = np.array(np.atleast_2d(X), dtype=float)
        Z[:, :d_log] = 10.0 ** Z[:, :d_log]
        diff = Z - mean
        return log_norm - 0.5 * np.einsum("ni,ij,nj->n", diff, inv, diff)

    return SyntheticModel(loglike, bounds, name=f"loggaussian_d{d}",
                          loglike_vec=loglike_vec)


def curved_degeneracy(rng=None, inf_floor=None):
    """Curved (banana-like) quartic degeneracy
    (reference: tests/model_generator.py:113).  With ``inf_floor`` set,
    log-likelihoods below the floor return -inf — this makes the SVM
    infinities classifier actually train (BASELINE config 4)."""

    def loglike(x):
        x_, y_ = np.atleast_1d(x)
        val = float(-(10 * (0.45 - x_)) ** 2 / 4
                    - (20 * (y_ / 4 - x_ ** 4)) ** 2)
        if inf_floor is not None and val < inf_floor:
            return -np.inf
        return val

    def loglike_vec(X):
        X = np.atleast_2d(X)
        x_, y_ = X[:, 0], X[:, 1]
        val = (-(10 * (0.45 - x_)) ** 2 / 4
               - (20 * (y_ / 4 - x_ ** 4)) ** 2)
        if inf_floor is not None:
            val = np.where(val < inf_floor, -np.inf, val)
        return val

    bounds = np.array([[-0.5, 1.5], [-0.5, 2.0]])
    name = "curved_degeneracy" + ("" if inf_floor is None else "_inf")
    return SyntheticModel(loglike, bounds, name=name,
                          loglike_vec=loglike_vec)


def ring(mean_radius=1.0, std=0.05, offset=0.0, rng=None):
    """Gaussian ring (reference: tests/model_generator.py:143)."""

    def loglike(x):
        x_, y_ = np.atleast_1d(x)
        r = np.sqrt((x_ - offset) ** 2 + y_ ** 2)
        return float(-0.5 * ((r - mean_radius) / std) ** 2)

    def loglike_vec(X):
        X = np.atleast_2d(X)
        r = np.sqrt((X[:, 0] - offset) ** 2 + X[:, 1] ** 2)
        return -0.5 * ((r - mean_radius) / std) ** 2

    bounds = np.array([[-1.5, 1.5], [-1.5, 1.5]]) + offset
    return SyntheticModel(loglike, bounds, name="ring",
                          loglike_vec=loglike_vec)


def himmelblau(rng=None):
    """Himmelblau's function as a log-likelihood
    (reference: tests/model_generator.py:175)."""

    def loglike(x):
        x_, y_ = np.atleast_1d(x)
        return float(-((x_**2 + y_ - 11) ** 2 + (x_ + y_**2 - 7) ** 2))

    def loglike_vec(X):
        X = np.atleast_2d(X)
        x_, y_ = X[:, 0], X[:, 1]
        return -((x_**2 + y_ - 11) ** 2 + (x_ + y_**2 - 7) ** 2)

    bounds = np.array([[-6.0, 6.0], [-6.0, 6.0]])
    return SyntheticModel(loglike, bounds, name="himmelblau",
                          loglike_vec=loglike_vec)


def rosenbrock(a=1.0, b=100.0, rng=None):
    """Rosenbrock log-likelihood (reference: tests/model_generator.py:217)."""

    def loglike(x):
        x_, y_ = np.atleast_1d(x)
        return float(-((a - x_) ** 2 + b * (y_ - x_**2) ** 2) / 20)

    def loglike_vec(X):
        X = np.atleast_2d(X)
        x_, y_ = X[:, 0], X[:, 1]
        return -((a - x_) ** 2 + b * (y_ - x_**2) ** 2) / 20

    bounds = np.array([[-4.0, 4.0], [-2.0, 10.0]])
    return SyntheticModel(loglike, bounds, name="rosenbrock",
                          loglike_vec=loglike_vec)


def spike(d=2, a=100.0, b=2.0, rng=None):
    """Broad Gaussian mode with a narrow near-equal-height spike at
    ``x_i = b`` in every dimension — the reference's actual Spike fixture
    (reference: tests/model_generator.py:258-291):
    ``chi2_i = -2 log(exp(-x^2) + (1 - exp(-b^2)) exp(-a (x - b)^2))``."""

    def loglike(x):
        x_ = np.atleast_1d(x)
        chi2 = -2.0 * np.log(np.exp(-x_ ** 2)
                             + (1.0 - np.exp(-b * b))
                             * np.exp(-a * (x_ - b) ** 2))
        return float(-0.5 * np.sum(chi2))

    def loglike_vec(X):
        X = np.atleast_2d(X)
        chi2 = -2.0 * np.log(np.exp(-X ** 2)
                             + (1.0 - np.exp(-b * b))
                             * np.exp(-a * (X - b) ** 2))
        return -0.5 * np.sum(chi2, axis=1)

    bounds = np.array([[-4.0, 4.0]] * d)
    return SyntheticModel(loglike, bounds, name="spike",
                          loglike_vec=loglike_vec)


def flat_base_spike(rng=None):
    """Narrow spike on a NEAR-FLAT broad base — a harder-than-reference
    stress fixture (no acquisition signal anywhere outside ~2% of the
    prior box; the reference crashes on targets like this in sklearn's
    SVC and otherwise gives up on starvation, gpry/run.py:885-911).
    Exercises the Sobol exploration fallback + flat-convergence veto."""

    def loglike(x):
        x_ = np.atleast_1d(x)[0]
        return float(np.log(1e-4 + np.exp(-0.5 * (x_ / 0.01) ** 2)))

    def loglike_vec(X):
        x_ = np.atleast_2d(X)[:, 0]
        return np.log(1e-4 + np.exp(-0.5 * (x_ / 0.01) ** 2))

    bounds = np.array([[-1.0, 1.0]])
    return SyntheticModel(loglike, bounds, name="flat_base_spike",
                          loglike_vec=loglike_vec)


def kl_truth_gaussian(samples_X, weights, mean_true, cov_true):
    """
    Weighted-MC estimate of KL(sample-Gaussian || truth) in both directions,
    as the e2e accuracy gate (reference: tests/test_pipeline.py:64-88,
    tests/grid.py:106-113).
    """
    from gpry_tpu.utils.tools import kl_norm, mean_covmat_from_samples
    mean_mc, cov_mc = mean_covmat_from_samples(samples_X, weights)
    return max(kl_norm(mean_mc, cov_mc, mean_true, cov_true),
               kl_norm(mean_true, cov_true, mean_mc, cov_mc))
