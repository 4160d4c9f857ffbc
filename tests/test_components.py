"""
Unit tests for preprocessing, classifier, proposers, tools, truth.
"""

import numpy as np
import pytest

from gpry_tpu.acquisition.proposal import (CentroidsProposer,
                                           MeanCovProposer, PartialProposer,
                                           ReferenceProposer,
                                           UniformProposer)
from gpry_tpu.models.classifier import SVM
from gpry_tpu.models.preprocessing import (Normalize_bounds, Normalize_y,
                                           NormalizeChi2_y, Pipeline_X)
from gpry_tpu.truth import Truth, get_truth
from gpry_tpu.utils.tools import (check_candidates, get_Xnumber,
                                  delta_logp_of_1d_nstd, kl_norm,
                                  nstd_of_1d_nstd, shrink_bounds)


def test_normalize_bounds_roundtrip(rng):
    bounds = np.array([[-3.0, 5.0], [2.0, 2.5]])
    pre = Normalize_bounds(bounds)
    X = rng.uniform(bounds[:, 0], bounds[:, 1], size=(10, 2))
    X_ = pre.transform(X)
    assert np.all((X_ >= 0) & (X_ <= 1))
    assert np.allclose(pre.inverse_transform(X_), X)
    assert np.allclose(pre.transform_bounds(bounds),
                       np.array([[0.0, 1.0], [0.0, 1.0]]))


def test_normalize_y_ignores_infinities(rng):
    y = np.array([-1.0, -2.0, -np.inf, -3.0, -np.inf])
    pre = Normalize_y()
    pre.fit(None, y)
    assert np.isclose(pre.mean_, -2.0)
    y_ = pre.transform(y)
    assert y_[2] == -np.inf  # -inf maps to -inf under affine transform
    assert np.allclose(pre.inverse_transform(y_[:2]), y[:2])


def test_normalize_chi2_y():
    X = np.zeros((4, 3))
    y = np.array([-10.0, -5.0, -1.0, -20.0])
    pre = NormalizeChi2_y(nsigma=1)
    pre.fit(X, y)
    delta = delta_logp_of_1d_nstd(1, 3)
    assert np.isclose(pre.mean_, -1.0 - delta)
    assert np.isclose(pre.std_, delta)


def test_pipeline_x(rng):
    bounds = np.array([[-1.0, 3.0]])
    pipe = Pipeline_X([Normalize_bounds(bounds)])
    X = rng.uniform(-1, 3, size=(5, 1))
    assert np.allclose(pipe.inverse_transform(pipe.transform(X)), X)
    assert pipe.is_linear


def test_svm_threshold_and_predict(rng):
    X = rng.uniform(size=(50, 2))
    y = -0.5 * np.sum(((X - 0.5) / 0.2) ** 2, axis=1)
    y[X[:, 0] > 0.8] = -np.inf
    svm = SVM()
    finite = svm.fit(X, y, diff_threshold=20.0)
    assert np.array_equal(finite, (y >= y.max() - 20.0) & np.isfinite(y))
    pred = svm.predict(np.array([[0.5, 0.5], [0.95, 0.5]]))
    assert pred[0]
    # device decision function must agree with libsvm on a batch
    import jax.numpy as jnp
    from gpry_tpu.models.classifier import svm_decision
    params = svm.device_params()
    Xq = rng.uniform(size=(200, 2))
    dev = np.asarray(svm_decision(params, jnp.asarray(Xq)))
    host = svm.predict(Xq)
    assert np.array_equal(dev, host)


def test_svm_all_finite_fast_path(rng):
    X = rng.uniform(size=(10, 2))
    y = -np.arange(10.0)
    svm = SVM()
    finite = svm.fit(X, y, diff_threshold=100.0)
    assert np.all(finite) and svm.all_finite
    assert np.all(svm.predict(rng.uniform(size=(5, 2))))


def test_proposers_in_bounds(rng):
    bounds = np.array([[-2.0, 1.0], [0.0, 4.0]])
    for prop in (UniformProposer(bounds),
                 PartialProposer(bounds, UniformProposer(bounds)),
                 MeanCovProposer(bounds, mean=[-0.5, 2.0],
                                 cov=np.eye(2) * 0.1)):
        X = prop.get_batch(64, rng)
        assert X.shape == (64, 2)
        assert np.all((X >= bounds[:, 0]) & (X <= bounds[:, 1]))


def test_centroids_proposer(rng):
    bounds = np.array([[0.0, 1.0]] * 2)

    class _GP:
        X_train = rng.uniform(size=(10, 2))

    prop = CentroidsProposer(bounds)
    prop.update(_GP())
    X = prop.get_batch(32, rng)
    assert np.all((X >= 0) & (X <= 1))


def test_get_xnumber_dsl():
    assert get_Xnumber("3d", "d", 8) == 24
    assert get_Xnumber("30d1.5", "d", 4, dtype=float) == 30 * 4 ** 1.5
    assert get_Xnumber(5, "d", 8) == 5
    assert get_Xnumber("d", "d", 8) == 8
    val, has_s, power = get_Xnumber("20s", "s", None, dtype=float)
    assert val == 20 and has_s and power is None
    with pytest.raises(ValueError):
        get_Xnumber("abc", "d", 8)


def test_mean_covmat_degenerate_weights_finite():
    """Degenerate weights (ESS -> 1) must not spray inf/nan through the
    Bessel correction (observed live from collapsed NS samples at d=20);
    the fallback biased estimator is finite and ~0."""
    from gpry_tpu.utils.tools import mean_covmat_from_samples

    X = np.random.default_rng(0).normal(size=(50, 3))
    w = np.zeros(50)
    w[7] = 1.0
    mean, cov = mean_covmat_from_samples(X, w)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(cov))
    np.testing.assert_allclose(mean, X[7])
    np.testing.assert_allclose(cov, 0.0, atol=1e-12)
    # non-degenerate weights keep the exact Bessel-corrected value
    w2 = np.full(50, 1.0 / 50)
    _, cov2 = mean_covmat_from_samples(X, w2)
    np.testing.assert_allclose(cov2, np.cov(X.T), rtol=1e-10)


def test_chi2_geometry():
    # 1-sigma in 1d is 1 std and delta logp 0.5
    assert np.isclose(nstd_of_1d_nstd(1, 1), 1.0)
    assert np.isclose(delta_logp_of_1d_nstd(1, 1), 0.5)
    # grows with dimension
    assert nstd_of_1d_nstd(1, 10) > nstd_of_1d_nstd(1, 2)


def test_kl_norm_identity():
    mean, cov = np.zeros(3), np.eye(3)
    assert np.isclose(kl_norm(mean, cov, mean, cov), 0.0)
    assert kl_norm(mean + 1, cov, mean, cov) > 0


def test_check_candidates():
    X_train = np.array([[0.0, 0.0], [1.0, 1.0]])
    cand = np.array([[0.0, 0.0], [0.5, 0.5], [0.5, 0.5]])
    dup = check_candidates(X_train, cand)
    assert dup.tolist() == [True, False, True]


def test_shrink_bounds():
    bounds = np.array([[0.0, 10.0]])
    X = np.array([[4.0], [5.0], [6.0]])
    y = np.array([-1.0, 0.0, -1.0])
    nb = shrink_bounds(bounds, X, y, factor=1.0)
    assert nb[0, 0] >= 3.9 and nb[0, 1] <= 6.1


def test_truth_wrapping():
    t = get_truth(lambda x: -float(np.sum(x**2)), bounds=[[-1, 1], [-1, 1]])
    assert t.d == 2
    # flat prior volume = 4 -> logprior = -log 4
    assert np.isclose(t.logp([0.0, 0.0]), -np.log(4.0))
    assert t.logp([2.0, 0.0]) == -np.inf
    # per-parameter signature
    t2 = get_truth(lambda a, b: -(a**2 + b**2), bounds={"a": [-1, 1],
                                                        "b": [-1, 1]})
    assert t2.params == ["a", "b"]
    assert np.isclose(t2.logp([0.5, 0.5]), -0.5 - np.log(4.0))
    # sampling
    X = t.prior_sample(20, rng=np.random.default_rng(0))
    assert X.shape == (20, 2) and np.all(np.abs(X) <= 1)


def test_reference_proposer_uses_truth():
    t = get_truth(lambda x: 0.0, bounds=[[-4, 4]],
                  ref_bounds=[[-1.0, 1.0]])
    prop = ReferenceProposer(t.bounds, truth=t)
    X = prop.get_batch(50, np.random.default_rng(0))
    assert np.all(np.abs(X) <= 1.0)  # drawn from the narrower ref box


def test_affine_params_probing(rng):
    """affine_params_X/_y recover (loc, scale) from any affine preprocessor
    and reject non-diagonal/non-affine ones (ADVICE r1)."""
    from gpry_tpu.models.preprocessing import (
        Normalize_bounds, Normalize_y, NormalizeChi2_y, Pipeline_y,
        Whitening, affine_params_X, affine_params_y)
    bounds = np.array([[-3.0, 5.0], [10.0, 11.0]])
    pre = Normalize_bounds(bounds)
    loc, scale = affine_params_X(pre, 2)
    np.testing.assert_allclose(loc, bounds[:, 0])
    np.testing.assert_allclose(scale, bounds[:, 1] - bounds[:, 0])

    y = rng.normal(size=50) * 7.0 - 3.0
    pre_y = Normalize_y()
    pre_y.fit(None, y)
    loc, scale = affine_params_y(pre_y)
    np.testing.assert_allclose(loc, pre_y.mean_)
    np.testing.assert_allclose(scale, pre_y.std_)

    # pipelines of affine transforms work through probing too
    pre_c = NormalizeChi2_y(nsigma=1)
    X = rng.uniform(size=(50, 2))
    pre_c.fit(X, y)
    pipe = Pipeline_y([pre_c])
    loc, scale = affine_params_y(pipe)
    z = pipe.transform(y)
    np.testing.assert_allclose(z * scale + loc, y)

    # whitening is affine but not diagonal: must raise, not silently
    # fall back to identity
    w = Whitening()
    X = rng.multivariate_normal([0, 0], [[2.0, 1.5], [1.5, 2.0]], size=100)
    w.fit(X, None)
    with pytest.raises(ValueError):
        affine_params_X(w, 2)


def test_runner_api_conveniences(rng, tmp_path):
    """Runner evaluation/IO conveniences (reference: gpry/run.py:615-775)."""
    from gpry_tpu.run import Runner

    def loglike(x):
        return float(-0.5 * np.sum((np.asarray(x) / 0.3) ** 2))

    ckpt = str(tmp_path / "api_ckpt")
    r = Runner(loglike, bounds=np.array([[-1.0, 1.0]] * 2), seed=0,
               verbose=1,
               options={"max_total": 10, "n_initial": 6,
                        "n_points_per_acq": 2},
               convergence_criterion=False, mc="uniform",
               checkpoint=ckpt, load_checkpoint="overwrite")
    r.run()
    x = np.array([[0.1, -0.1]])
    # surrogate vs truth evaluation surfaces
    assert np.isfinite(r.logp(x)[0])
    np.testing.assert_allclose(r.logL(x),
                               r.logp(x) + r.truth.log_prior_volume)
    np.testing.assert_allclose(r.logp_truth(x)[0], loglike(x[0])
                               + r.logprior(x)[0])
    assert r.params == r.truth.params
    df = r.last_mc_samples_pandas()
    assert {"weight", "logpost"} <= set(df.columns)
    # public checkpoint save/read round-trip
    r.save_checkpoint()
    n = r.gpr.n_total
    r.read_checkpoint()
    assert r.gpr.n_total == n
