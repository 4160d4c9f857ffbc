"""
Smoke tests for the plotting module (Agg backend; files written to tmp).
"""

import numpy as np
import pytest

from gpry_tpu import plots as gplots
from gpry_tpu.models.gp import GaussianProcessRegressor
from gpry_tpu.models.preprocessing import Normalize_bounds, Normalize_y
from gpry_tpu.convergence import CorrectCounter
from gpry_tpu.progress import Progress, Timer


@pytest.fixture(scope="module")
def fitted_gpr():
    rng = np.random.default_rng(0)
    bounds = np.array([[0.0, 1.0]] * 2)
    X = rng.uniform(size=(25, 2))
    y = -0.5 * np.sum(((X - 0.5) / 0.2) ** 2, axis=1)
    y[X[:, 0] > 0.9] = -np.inf
    gpr = GaussianProcessRegressor(
        bounds=bounds, preprocessing_X=Normalize_bounds(bounds),
        preprocessing_y=Normalize_y(), n_restarts_optimizer=4,
        random_state=1)
    gpr.append_to_data(X, y)
    return gpr


def test_plot_model_2d(fitted_gpr, tmp_path):
    for what in ("mean", "std"):
        out = tmp_path / f"model_{what}.png"
        gplots.plot_model_2d(fitted_gpr, what=what, n_grid=30,
                             save=str(out))
        assert out.exists() and out.stat().st_size > 1000


def test_plot_trace_and_slices(fitted_gpr, tmp_path):
    out = tmp_path / "trace.png"
    gplots.plot_trace(fitted_gpr, save=str(out))
    assert out.exists()
    out2 = tmp_path / "slices.png"
    gplots.plot_slices(None, fitted_gpr, n_points=21, save=str(out2))
    assert out2.exists()


def test_plot_corner_and_distance(fitted_gpr, tmp_path):
    rng = np.random.default_rng(1)
    X = rng.normal(0.5, 0.2, size=(500, 2))
    samples = {"X": X, "weights": np.ones(500),
               "logpost": -np.sum((X - 0.5) ** 2, axis=1)}
    out = tmp_path / "corner.png"
    gplots.plot_corner(samples, gpr=fitted_gpr, save=str(out))
    assert out.exists()
    out2 = tmp_path / "dist.png"
    gplots.plot_distance_distribution(fitted_gpr, samples, save=str(out2))
    assert out2.exists()
    # reference API name (gpry/plots.py:412) resolves to the same function
    assert gplots.plot_corner_getdist is gplots.plot_corner


def test_plot_convergence_and_timing(fitted_gpr, tmp_path):
    cc = CorrectCounter(fitted_gpr.bounds, {})
    cc.is_converged(fitted_gpr, new_y=[-1.0], pred_y=[-1.01])
    out = tmp_path / "conv.png"
    gplots.plot_convergence([cc], save=str(out))
    assert out.exists()
    prog = Progress()
    prog.add_iteration()
    prog.add_current_n_truth(10, 9)
    with Timer() as t:
        pass
    prog.add_acquisition(t)
    prog.add_truth(t, n_evals=2)
    prog.add_fit(t)
    prog.add_convergence(t, 0.1)
    out2 = tmp_path / "timing.png"
    prog.plot_timing(save=str(out2))
    assert out2.exists()


def test_plot_slices_func_and_reference(fitted_gpr, tmp_path):
    """Multi-point slices with acquisition row + slices through a fiducial
    reference point (reference: gpry/plots.py:246-407)."""
    from gpry_tpu.acquisition.functions import LogExp

    class _T:
        prior_bounds = fitted_gpr.bounds
        params = ["x_1", "x_2"]

        @staticmethod
        def logp(x):
            return float(-0.5 * np.sum(((np.asarray(x) - 0.5) / 0.2) ** 2))

    out = tmp_path / "slices_func.png"
    gplots.plot_slices_func(_T(), fitted_gpr, acquisition=LogExp(zeta=0.5),
                            n_points=25, max_points=5, save=str(out))
    assert out.exists() and out.stat().st_size > 1000
    out2 = tmp_path / "slices_ref.png"
    gplots.plot_slices_reference(_T(), fitted_gpr, X_ref=[0.5, 0.5],
                                 n_points=21, save=str(out2))
    assert out2.exists()


def test_plot_corner_with_fiducials(fitted_gpr, tmp_path):
    rng = np.random.default_rng(2)
    X = rng.normal(0.5, 0.2, size=(400, 2))
    samples = {"X": X, "weights": np.ones(400),
               "logpost": -np.sum((X - 0.5) ** 2, axis=1)}
    fid_mc = {"X": rng.normal(0.52, 0.18, size=(400, 2))}
    out = tmp_path / "corner_fid.png"
    gplots.plot_corner(samples, gpr=fitted_gpr, fiducial_point=[0.5, 0.5],
                       fiducial_MC=fid_mc, save=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_diag_nora_dumps(tmp_path):
    """diag.plot_nora_sample writes the triangle + d=2 contour dumps
    (reference: gpry/diag.py:152-218)."""
    import os
    from gpry_tpu.diag import diagnosis, plot_nora_sample
    from gpry_tpu.run import Runner

    def loglike(x):
        return float(-0.5 * np.sum(((np.asarray(x) - 0.5) / 0.2) ** 2))

    ckpt = str(tmp_path / "diagckpt")
    runner = Runner(loglike, bounds=np.array([[0.0, 1.0]] * 2), seed=3,
                    verbose=1,
                    gp_acquisition={"NORA": {"nlive_max": 40,
                                             "num_repeats": 6}},
                    options={"n_initial": 6, "max_total": 10,
                             "n_points_per_acq": 2},
                    convergence_criterion=False, mc="uniform",
                    checkpoint=ckpt, load_checkpoint="overwrite")
    runner.run()
    runner.set_fiducial_point([0.5, 0.5])
    report = diagnosis(runner)
    assert report["sizes_consistent"]
    path = plot_nora_sample(runner)
    files = os.listdir(path)
    assert any(f.startswith("NORA_iteration_") for f in files)
    assert any(f.startswith("contours_mean_") for f in files)
    assert any(f.startswith("contours_acq_") for f in files)
