"""
Introductory example (mirrors the reference's introductory_example.py):
set up a likelihood, run the active-learning loop, draw MC samples from the
surrogate, and plot.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

# Step 1: a likelihood function
import numpy as np
from scipy.stats import multivariate_normal

mean = [3, 2]
cov = [[0.5, 0.4], [0.4, 1.5]]
rv = multivariate_normal(mean, cov)


def logLkl(x_1, x_2):
    return rv.logpdf(np.array([x_1, x_2]).T)


bounds = [[-10, 10], [-10, 10]]

if __name__ == "__main__":
    # Step 2: the Runner
    from gpry_tpu.run import Runner
    checkpoint = "output/introductory"
    runner = Runner(logLkl, bounds, checkpoint=checkpoint,
                    load_checkpoint="overwrite", seed=0)

    # Step 3: the active-learning loop
    runner.run()

    # Step 4: MC samples from the surrogate
    samples = runner.generate_mc_sample()

    # Step 5: inspect
    X, w = samples["X"], samples["weights"]
    m = w @ X / w.sum()
    c = ((X - m) * w[:, None]).T @ (X - m) / w.sum()
    print("truth evals:", runner.gpr.n_total)
    print("mean:", m, " (truth:", mean, ")")
    print("cov:\n", c, "\n (truth:", cov, ")")
    try:
        runner.plot_mc(output=checkpoint + "/corner.png")
        runner.plot_progress()
    except Exception as exc:
        print(f"(plotting skipped: {exc})")
