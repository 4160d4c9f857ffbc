"""
Extended-kernel example: any scikit-learn-style kernel expression can be
passed through ``gpr={"kernel": ...}`` — here a ConstantKernel x
RationalQuadratic composite (see gpry_tpu/ops/kernels.py:build_kernel_spec
for the full grammar: RBF, Matern(nu), RationalQuadratic, ExpSineSquared,
DotProduct, WhiteKernel, ConstantKernel, Sum/Product/Exponentiation).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

from gpry_tpu.run import Runner


def loglike(x, y):
    return -0.5 * ((x - 0.5) ** 2 / 0.3 ** 2 + (y + 0.2) ** 2 / 0.5 ** 2)


KERNEL = {"Product": [
    {"ConstantKernel": {"constant_value": 1.0,
                        "constant_value_bounds": (1e-3, 1e3)}},
    {"RationalQuadratic": {"alpha": 1.0, "length_scale": 0.3,
                           "alpha_bounds": (1e-2, 1e2),
                           "length_scale_bounds": (1e-2, 10.0)}},
]}

if __name__ == "__main__":
    runner = Runner(loglike, bounds={"x": [-3, 3], "y": [-3, 3]},
                    gpr={"kernel": KERNEL}, seed=0)
    runner.run()
    samples = runner.generate_mc_sample()
    X, w = samples["X"], samples["weights"]
    mean = w @ X / w.sum()
    print(f"truth evaluations used: {runner.gpr.n_total}")
    print(f"posterior mean: {mean}  (truth: [0.5, -0.2])")
