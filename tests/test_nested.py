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


def test_ns_segmented_identical_to_single_program():
    """Bounded-segment execution (watchdog protection for long runs) must
    reproduce the single-program run bit-for-bit: the loop is simply
    re-entered where it left off."""
    from gpry_tpu.mc.nested import run_nested_device
    d = 2
    lo, hi = jnp.zeros(d), jnp.ones(d)
    kw = dict(nlive=80, num_repeats=8, max_dead=2000, kill_batch=8)
    params = (jnp.full(d, 0.35), 0.07)
    res_one = run_nested_device(_gauss_logl, params, jax.random.PRNGKey(7),
                                lo, hi, max_steps_per_call=0, **kw)
    # strict dispatch-then-wait, and speculative pipelined dispatch (extra
    # no-op segments enqueued past completion) must both be bit-identical
    for la in (0, 3):
        res_seg = run_nested_device(
            _gauss_logl, params, jax.random.PRNGKey(7), lo, hi,
            max_steps_per_call=3, lookahead=la, **kw)
        assert int(res_one.n_dead) == int(res_seg.n_dead)
        assert int(res_one.n_calls) == int(res_seg.n_calls)
        np.testing.assert_array_equal(np.asarray(res_one.X),
                                      np.asarray(res_seg.X))
        np.testing.assert_array_equal(np.asarray(res_one.logw),
                                      np.asarray(res_seg.logw))
        assert float(res_one.logZ) == float(res_seg.logZ)


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


def test_ns_f32_proposals_importance_corrected(rng):
    """f32-proposal NS + f64 re-scoring: the tolerance gate must keep f64
    when the estimated f32 distortion is large, and when the corrected
    path does run, the importance-corrected moments must match the pure
    fit-dtype run."""
    from gpry_tpu import config
    from gpry_tpu.mc.samples import mc_sample_from_gp
    from gpry_tpu.models.gp import (GaussianProcessRegressor,
                                    ns_proposal_params)
    from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y

    bounds = np.array([[0.0, 1.0], [0.0, 1.0]])
    X = rng.uniform(size=(40, 2))
    y = -0.5 * 25 * np.sum((X - 0.5) ** 2, axis=1)
    gpr = GaussianProcessRegressor(
        bounds=bounds, preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), n_restarts_optimizer=8,
        random_state=3)
    gpr.append_to_data(X, y)
    p = gpr.surrogate_params()

    # 1. the gate: estimates above the tolerance keep the fit dtype even
    # under "force"
    old_mode, old_tol = config.NS_PROPOSAL_F32, config.NS_PROPOSAL_F32_TOL
    try:
        config.NS_PROPOSAL_F32 = "force"
        _, corrected = ns_proposal_params(p, err_est=5.0)
        assert not corrected
        _, corrected = ns_proposal_params(p, err_est=0.01)
        assert corrected

        # 2. the correction mechanics: run both paths and compare moments
        def moments(out):
            w = np.asarray(out["weights"])
            m = np.average(out["X"], axis=0, weights=w)
            v = np.average((out["X"] - m) ** 2, axis=0, weights=w)
            return m, np.sqrt(v)

        config.NS_PROPOSAL_F32 = "0"
        m0, s0 = moments(mc_sample_from_gp(gpr, sampler="nested", rng=5))
        config.NS_PROPOSAL_F32 = "force"
        config.NS_PROPOSAL_F32_TOL = 1e9  # exercise the corrected path
        out = mc_sample_from_gp(gpr, sampler="nested", rng=5)
        m1, s1 = moments(out)
    finally:
        config.NS_PROPOSAL_F32 = old_mode
        config.NS_PROPOSAL_F32_TOL = old_tol
    assert np.allclose(m0, [0.5, 0.5], atol=0.03)
    assert np.allclose(m1, [0.5, 0.5], atol=0.05)
    assert np.allclose(m1, m0, atol=0.05)
    assert np.allclose(s1, s0, rtol=0.3)
    assert np.isfinite(out["logZ"])
