"""
Host NS adapter tests (gpry_tpu/mc/interfaces.py).

pypolychord / ultranest / nessai are not installable in this image, so the
adapters run live against API doubles (tests/minins.py, the pattern of
tests/minicobaya.py): each test installs the double, executes the adapter
end-to-end on an analytic 2-d Gaussian (directly, through
mc_sample_from_gp, and through NORA's host-engine route), and checks the
recovered posterior moments.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import minins

from gpry_tpu.mc.interfaces import (InterfaceDevice, _ns_interfaces,
                                    init_nested_sampler)

BOUNDS = np.array([[-2.0, 2.0], [-2.0, 2.0]])
MEAN = np.array([0.3, -0.4])
STD = np.array([0.25, 0.35])


def gauss_logp(X):
    X = np.atleast_2d(X)
    return -0.5 * np.sum(((X - MEAN) / STD) ** 2, axis=-1)


def check_moments(out, atol_mean=0.08, rtol_std=0.35):
    X = np.asarray(out["X"])
    w = np.asarray(out["weights"], dtype=float)
    assert len(X) == len(w) == len(out["logpost"])
    assert np.all(w >= 0) and w.max() > 0
    mean = np.average(X, axis=0, weights=w)
    var = np.average((X - mean) ** 2, axis=0, weights=w)
    assert np.allclose(mean, MEAN, atol=atol_mean), (mean, MEAN)
    assert np.allclose(np.sqrt(var), STD, rtol=rtol_std), (np.sqrt(var), STD)
    assert np.isfinite(out["logZ"])


@pytest.fixture
def no_ns_packages():
    minins.uninstall()
    yield
    minins.uninstall()


@pytest.mark.parametrize("name,install", [
    ("polychord", minins.install_polychord),
    ("ultranest", minins.install_ultranest),
    ("nessai", minins.install_nessai),
])
def test_host_adapter_runs(name, install, tmp_path, no_ns_packages):
    install()
    iface = _ns_interfaces[name](verbose=1, out_dir=str(tmp_path / name))
    iface.set_prior(BOUNDS, params=["a", "b"])
    iface.set_precision(nlive=80, num_repeats=10, precision_criterion=0.01,
                        nprior=160, seed=7)
    out = iface.run(gauss_logp)
    check_moments(out)
    # analytic evidence: log(2 pi sx sy) - log(box volume)
    logZ_true = np.log(2 * np.pi * STD.prod()) - np.log(16.0)
    assert abs(out["logZ"] - logZ_true) < 1.0
    iface.delete_output()


def test_import_error_without_packages(no_ns_packages):
    for name in ("polychord", "ultranest", "nessai"):
        with pytest.raises(ImportError):
            _ns_interfaces[name]()


def test_fallback_chain_reaches_device(no_ns_packages):
    iface = init_nested_sampler("polychord")
    assert isinstance(iface, InterfaceDevice)


def test_fallback_chain_prefers_installed(no_ns_packages):
    minins.install_ultranest()
    iface = init_nested_sampler("polychord")  # polychord missing
    assert type(iface).__name__ == "InterfaceUltraNest"


def _fitted_gpr(rng, d=2, n=30):
    from gpry_tpu.models.gp import GaussianProcessRegressor
    from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y
    X = rng.uniform(BOUNDS[:, 0], BOUNDS[:, 1], size=(n, d))
    y = gauss_logp(X)
    gpr = GaussianProcessRegressor(
        bounds=BOUNDS, preprocessing_X=Normalize_bounds(BOUNDS),
        preprocessing_y=Normalize_y(), n_restarts_optimizer=6,
        random_state=3)
    gpr.append_to_data(X, y, fit_gpr={"n_restarts": 6})
    return gpr


def test_mc_sample_from_gp_host_engine(rng, no_ns_packages):
    minins.install_ultranest()
    from gpry_tpu.mc.samples import mc_sample_from_gp
    gpr = _fitted_gpr(rng)
    n_eval_before = gpr.n_eval
    out = mc_sample_from_gp(gpr, sampler="ultranest", rng=rng,
                            options={"nlive": 80})
    check_moments(out, atol_mean=0.12, rtol_std=0.5)
    assert gpr.n_eval > n_eval_before


def test_nora_host_engine_route(rng, tmp_path, no_ns_packages):
    minins.install_polychord()
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)  # the double writes ./polychord_out
    try:
        from gpry_tpu.acquisition.nora import NORA
        gpr = _fitted_gpr(rng)
        nora = NORA(BOUNDS, sampler="polychord", nlive_max=80,
                    num_repeats=10, rng=rng)
        X_out, y_lies, acq_out = nora.multi_add(gpr, n_points=3)
        assert X_out.shape == (3, 2)
        assert np.all(np.isfinite(y_lies))
        assert np.all((X_out >= BOUNDS[:, 0]) & (X_out <= BOUNDS[:, 1]))
        # the NS sample doubles as the surrogate MC sample
        X_mc, logp_mc, w_mc = nora.last_MC_sample()
        assert len(X_mc) > 100
        assert nora.mean is not None
        assert np.allclose(nora.mean, MEAN, atol=0.15)
    finally:
        os.chdir(cwd)


def test_nora_host_engine_falls_back_to_device(rng, no_ns_packages):
    """sampler='polychord' with nothing installed must degrade to the
    on-device sampler, not crash (reference fallback chain,
    gpry/gp_acquisition.py:650-682)."""
    from gpry_tpu.acquisition.nora import NORA
    gpr = _fitted_gpr(rng)
    nora = NORA(BOUNDS, sampler="polychord", nlive_max=50, rng=rng)
    X_out, _, _ = nora.multi_add(gpr, n_points=2)
    assert X_out.shape == (2, 2)
