"""
End-to-end integration: full Runner loop on random correlated Gaussians,
gated on KL(surrogate MC sample || truth) <= 0.05
(mirrors reference tests/test_pipeline.py:64-101).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from model_generator import kl_truth_gaussian, random_gaussian  # noqa: E402

from gpry_tpu.run import Runner  # noqa: E402

KL_GATE = 0.05


@pytest.mark.parametrize("d", [1, 2, 3])
def test_pipeline_gaussian(d):
    m = random_gaussian(d=d, rng=10 + d)
    runner = Runner(m.loglike, bounds=m.bounds, seed=1, verbose=1)
    runner.run()
    assert runner.last_mc_result is not None
    X, w, _ = runner.last_mc_samples()
    kl = kl_truth_gaussian(X, w, m.mean, m.cov)
    assert kl <= KL_GATE, f"KL(surrogate||truth)={kl} > {KL_GATE} at d={d}"
    # sanity on budget: far fewer truth evals than the default cap
    assert runner.gpr.n_total <= runner.max_total


def test_pipeline_nora_gaussian():
    d = 2
    m = random_gaussian(d=d, rng=12)
    runner = Runner(m.loglike, bounds=m.bounds, seed=2, verbose=1,
                    gp_acquisition="NORA")
    runner.run()
    X, w, _ = runner.last_mc_samples()
    kl = kl_truth_gaussian(X, w, m.mean, m.cov)
    assert kl <= KL_GATE, f"NORA KL={kl} > {KL_GATE}"


if __name__ == "__main__":
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    test_pipeline_gaussian(dim)
