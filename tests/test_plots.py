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
