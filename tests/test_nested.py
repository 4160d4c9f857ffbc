"""
On-device nested sampler: posterior-moment and evidence recovery on an
analytically known Gaussian.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_logl(params, X):
    mu, s = params
    return -0.5 * jnp.sum(((X - mu) / s) ** 2, axis=-1)


def test_ns_gaussian_moments_and_logz():
    from gpry_tpu.mc.nested import run_nested_device
    d = 3
    mu_true, s_true = 0.4, 0.06
    lo, hi = jnp.zeros(d), jnp.ones(d)
    res = run_nested_device(
        _gauss_logl, (jnp.full(d, mu_true), s_true),
        jax.random.PRNGKey(0), lo, hi, nlive=150, num_repeats=15,
        max_dead=6000, kill_batch=8)
    logw = np.asarray(res.logw)
    keep = np.isfinite(logw)
    w = np.exp(logw[keep] - logw[keep].max())
    X = np.asarray(res.X)[keep]
    mean = w @ X / w.sum()
    var = w @ (X - mean) ** 2 / w.sum()
    assert np.allclose(mean, mu_true, atol=0.01)
    assert np.allclose(np.sqrt(var), s_true, rtol=0.15)
    logz_true = d * np.log(s_true * np.sqrt(2 * np.pi))
    assert abs(float(res.logZ) - logz_true) < 0.6


def test_ns_respects_box_and_neg_inf():
    """-inf plateaus (classifier-style) are never sampled."""
    from gpry_tpu.mc.nested import run_nested_device
    d = 2

    def logl(params, X):
        base = -0.5 * jnp.sum(((X - 0.7) / 0.05) ** 2, axis=-1)
        return jnp.where(X[:, 0] < 0.3, -jnp.inf, base)

    lo, hi = jnp.zeros(d), jnp.ones(d)
    res = run_nested_device(logl, (), jax.random.PRNGKey(1), lo, hi,
                            nlive=100, num_repeats=10, max_dead=3000)
    logw = np.asarray(res.logw)
    keep = np.isfinite(logw) & np.isfinite(np.asarray(res.logl))
    X = np.asarray(res.X)[keep]
    assert np.all(X >= 0) and np.all(X <= 1)
    assert np.all(X[:, 0] >= 0.3)


def test_mcmc_gaussian_moments():
    from gpry_tpu.mc.mcmc import run_mcmc_device
    d = 2
    lo, hi = jnp.zeros(d), jnp.ones(d)
    X, lps = run_mcmc_device(
        _gauss_logl, (jnp.full(d, 0.6), 0.1), jax.random.PRNGKey(2),
        lo, hi, n_chains=8, n_steps=1500)
    Xf = np.asarray(X).reshape(-1, d)
    assert np.allclose(Xf.mean(axis=0), 0.6, atol=0.02)
    assert np.allclose(Xf.std(axis=0), 0.1, rtol=0.2)
