"""
End-to-end on the curved (banana-like) degeneracy — BASELINE config 4:
non-Gaussian posterior exercising the SVM infinities classifier and NORA's
tail exploration.  Accuracy gate: posterior moments vs brute-force grid
integration.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from model_generator import curved_degeneracy  # noqa: E402

from gpry_tpu.run import Runner  # noqa: E402


def _grid_moments(bounds, logl_vec, n=241):
    gx = np.linspace(bounds[0, 0], bounds[0, 1], n)
    gy = np.linspace(bounds[1, 0], bounds[1, 1], n)
    GX, GY = np.meshgrid(gx, gy, indexing="ij")
    L = logl_vec(GX, GY)
    P = np.exp(L - L.max())
    Z = P.sum()
    mean = np.array([(P * GX).sum() / Z, (P * GY).sum() / Z])
    var = np.array([(P * (GX - mean[0]) ** 2).sum() / Z,
                    (P * (GY - mean[1]) ** 2).sum() / Z])
    return mean, np.sqrt(var)


def test_curved_degeneracy_moments():
    m = curved_degeneracy()

    def logl_vec(x, y):
        return -(10 * (0.45 - x)) ** 2 / 4 - (20 * (y / 4 - x ** 4)) ** 2

    mean_true, std_true = _grid_moments(m.bounds, logl_vec)
    runner = Runner(m.loglike, bounds=m.bounds, seed=3, verbose=1,
                    gp_acquisition="NORA")
    runner.run()
    X, w, _ = runner.last_mc_samples()
    mean_mc = w @ X / w.sum()
    std_mc = np.sqrt(w @ (X - mean_mc) ** 2 / w.sum())
    # moments within a third of the true posterior width
    assert np.all(np.abs(mean_mc - mean_true) < 0.34 * std_true), \
        (mean_mc, mean_true, std_true)
    assert np.all(std_mc < 2.0 * std_true) and \
        np.all(std_mc > 0.5 * std_true), (std_mc, std_true)
