"""
Convergence criteria: thresholds, policies, and combination logic.
"""

import numpy as np
import pytest

from gpry_tpu.convergence import (ConvergenceCheckError, CorrectCounter,
                                  DontConverge, GaussianKL, TrainAlignment,
                                  construct_criterion)
from gpry_tpu.utils.tools import nstd_of_1d_nstd


class _FakeGP:
    def __init__(self, y_max=0.0, n=10):
        self.y_max = y_max
        self.n = n
        self.n_total = n


def test_correct_counter_threshold_dsl():
    bounds = np.array([[0.0, 1.0]] * 4)
    cc = CorrectCounter(bounds, {})
    # defaults: n_correct = max(4, ceil(d/2)), abstol = 0.01 * nstd(1,d)^2
    assert cc.ncorrect == 4
    assert np.isclose(cc.abstol, 0.01 * nstd_of_1d_nstd(1, 4) ** 2)
    assert np.isclose(cc.reltol, 0.01)


def test_correct_counter_convergence_logic():
    bounds = np.array([[0.0, 1.0]] * 2)
    cc = CorrectCounter(bounds, {"n_correct": 3, "abstol": 0.1,
                                 "reltol": 0.0})
    gp = _FakeGP()
    new_X = np.zeros((2, 2))
    # two accurate batches: counter grows but not enough
    assert not cc.is_converged(gp, new_X=new_X, new_y=[-1.0, -2.0],
                               pred_y=[-1.01, -2.01])
    # one more accurate batch crosses n_correct=3
    assert cc.is_converged(gp, new_X=new_X, new_y=[-1.5, -0.5],
                           pred_y=[-1.5, -0.5])
    # a mispredict resets the counter
    assert not cc.is_converged(gp, new_X=new_X, new_y=[-1.0, -2.0],
                               pred_y=[-5.0, -2.0])
    # -inf truths are skipped entirely
    n_pred = cc.n_pred
    cc.is_converged(gp, new_X=new_X, new_y=[-np.inf, -np.inf],
                    pred_y=[0.0, 0.0])
    assert cc.n_pred == n_pred


def test_policies_and_construction():
    bounds = np.array([[0.0, 1.0]] * 2)
    cc = construct_criterion("CorrectCounter", bounds)
    assert cc.is_sufficient and not cc.is_necessary
    ta = TrainAlignment(bounds, {})
    assert ta.is_necessary and not ta.is_sufficient
    dc = DontConverge(bounds, {})
    assert not dc.is_converged(_FakeGP())
    with pytest.raises(ValueError):
        construct_criterion("NotACriterion", bounds)
    with pytest.raises(ValueError):
        CorrectCounter(bounds, {"policy": "x"})


def test_gaussian_kl_needs_history():
    bounds = np.array([[0.0, 1.0]] * 2)
    gkl = GaussianKL(bounds, {})

    class _Acq:
        mean = np.array([0.5, 0.5])
        cov = np.eye(2) * 0.01

    gp = _FakeGP()
    # first call: no previous mean/cov -> ConvergenceCheckError
    with pytest.raises(ConvergenceCheckError):
        gkl.criterion_value(gp, acquisition=_Acq())
    # identical mean/cov -> KL == 0 -> converged after limit_times
    for _ in range(gkl.limit_times):
        converged = gkl.is_converged(gp, acquisition=_Acq())
    assert converged
