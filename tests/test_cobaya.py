"""
Cobaya wrapper smoke test (mirrors reference tests/test_cobaya.py).
Skipped when cobaya is not installed (it is optional and absent in the
TPU image); the wrapper itself is importable and its defaults block is
validated regardless.
"""

import numpy as np
import pytest


def test_defaults_schema():
    from gpry_tpu.cobaya import DEFAULTS
    # the declarative schema must cover the loop options and blocks
    for key in ("n_initial", "max_initial", "max_total", "n_points_per_acq",
                "gpr", "gp_acquisition", "convergence_criterion",
                "mc_sampler", "checkpoint", "verbose"):
        assert key in DEFAULTS


def test_wrapper_requires_cobaya():
    pytest.importorskip("cobaya", reason="cobaya not installed")
    # with cobaya present, run the reference's smoke scenario
    from cobaya.model import get_model
    from gpry_tpu.cobaya import CobayaWrapper  # noqa: F401

    def loglike(x, y):
        return -0.5 * ((x - 0.5) ** 2 + (y + 0.5) ** 2) / 0.04

    info = {
        "likelihood": {"gauss": {
            "external": loglike, "input_params": ["x", "y"]}},
        "params": {
            "x": {"prior": {"min": -2, "max": 2}},
            "y": {"prior": {"min": -2, "max": 2}},
        },
    }
    model = get_model(info)
    from gpry_tpu.run import Runner
    runner = Runner(model, seed=0, verbose=1)
    runner.run()
    assert runner.last_mc_result is not None
