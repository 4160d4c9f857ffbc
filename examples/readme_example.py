"""
Minimal end-to-end example (mirrors the reference's readme_example.py):
2-D correlated Gaussian log-likelihood, full Runner loop, final MC sample
and corner plot.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np
from scipy.stats import multivariate_normal

from gpry_tpu.run import Runner

rv = multivariate_normal([3.0, 2.0], [[0.5, 0.4], [0.4, 1.5]])


def loglike(x, y):
    return np.log(rv.pdf(np.array([x, y])))


bounds = {"x": [-10.0, 10.0], "y": [-10.0, 10.0]}

if __name__ == "__main__":
    runner = Runner(loglike, bounds=bounds, checkpoint="output/simple",
                    load_checkpoint="overwrite", seed=0)
    runner.run()
    samples = runner.generate_mc_sample()
    X, w = samples["X"], samples["weights"]
    mean = w @ X / w.sum()
    print(f"truth evaluations used: {runner.gpr.n_total}")
    print(f"posterior mean: {mean}  (truth: [3, 2])")
    try:
        runner.plot_mc(output="output/simple/corner.png")
    except Exception as exc:
        print(f"(plotting skipped: {exc})")
