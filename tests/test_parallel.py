"""
Multi-chip sharding (8-device CPU mesh) and host-parallel components.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpry_tpu.models.classifier import trivial_svm_params
from gpry_tpu.models.gp import SurrogateParams, surrogate_predict
from gpry_tpu.ops.kernels import make_theta
from gpry_tpu.ops.linalg import factorize
from gpry_tpu.parallel.mesh import (_sharded_fit_theta, make_mesh,
                                    sharded_predict, tp_predict)


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh(devices[:8])


@pytest.fixture(scope="module")
def params():
    from gpry_tpu import config
    rng = np.random.default_rng(0)
    d, n, nmax = 4, 48, 64
    dt = config.FIT_DTYPE
    X = np.zeros((nmax, d))
    X[:n] = rng.uniform(size=(n, d))
    y = np.zeros(nmax)
    y[:n] = rng.normal(size=n)
    theta = jnp.asarray(make_theta(1.5, [0.3] * d), dt)
    Xd, yd = jnp.asarray(X, dt), jnp.asarray(y, dt)
    L, alpha = factorize("rbf", theta, Xd, yd, n, 1e-4)
    return SurrogateParams(
        theta=theta, X=Xd, y=yd, n=jnp.asarray(n, jnp.int32),
        noise_var=jnp.asarray(1e-4, dt), L=L, alpha=alpha,
        x_loc=jnp.zeros(d, dt), x_scale=jnp.ones(d, dt),
        y_loc=jnp.asarray(0.0, dt), y_scale=jnp.asarray(1.0, dt),
        y_max=jnp.max(yd), clip_max=jnp.asarray(np.inf, dt),
        svm=trivial_svm_params(d, dtype=dt),
        trust_lo=jnp.full(d, -jnp.inf, dt),
        trust_hi=jnp.full(d, jnp.inf, dt))


def test_sharded_predict_matches_single(mesh8, params):
    rng = np.random.default_rng(1)
    Xq = jnp.asarray(rng.uniform(size=(64, 4)), params.X.dtype)
    with mesh8:
        mean_s, std_s = sharded_predict("rbf", params, Xq, mesh8)
    mean, std = surrogate_predict("rbf", params, Xq)
    assert np.allclose(np.asarray(mean_s), np.asarray(mean))
    assert np.allclose(np.asarray(std_s), np.asarray(std))


def test_tp_predict_matches(mesh8, params):
    """The production TP entry point (training axis sharded, psum mean +
    K^-1 quadratic-form std) must match the single-device gated predict."""
    rng = np.random.default_rng(2)
    Xq = jnp.asarray(rng.uniform(size=(8, 4)), params.X.dtype)
    with mesh8:
        mean_tp, std_tp = tp_predict("rbf", params, Xq, mesh8)
    mean, std = surrogate_predict("rbf", params, Xq)
    assert np.allclose(np.asarray(mean_tp), np.asarray(mean), atol=1e-10)
    assert np.allclose(np.asarray(std_tp), np.asarray(std),
                       rtol=1e-7, atol=1e-9)


def test_sharded_fit_theta_matches_single(mesh8, params):
    rng = np.random.default_rng(3)
    d = 4
    lo = jnp.full(1 + d, -5.0, params.X.dtype)
    hi = jnp.full(1 + d, 5.0, params.X.dtype)
    theta0s = jnp.asarray(rng.uniform(-3, 3, size=(16, 1 + d)),
                          params.X.dtype)
    with mesh8:
        thetas, nlls, nevs = _sharded_fit_theta(
            "rbf", params.X, params.y, params.n, 1e-4, theta0s, lo, hi,
            mesh8, maxiter=100)
    nlls = np.asarray(nlls)
    assert nlls.shape == (16,)
    assert np.isfinite(nlls).sum() >= 14
    # results must not depend on which shard a restart landed in: re-run
    # single-device at the same production-scale maxiter and compare EVERY
    # restart's endpoint objective (catches shard-dependent optimizer
    # trajectories, not just the argmin)
    from gpry_tpu.models.gp import _fit_theta_restarts
    thetas_1, nlls_1, nevs_1 = _fit_theta_restarts(
        "rbf", params.X, params.y, params.n, 1e-4, theta0s, lo, hi,
        maxiter=100)
    nlls_1 = np.asarray(nlls_1)
    # exact eval counts: at least 1 per lane (the initial value_and_grad),
    # and identical counts whichever shard a lane landed in
    assert np.all(np.asarray(nevs_1) >= 1)
    assert np.array_equal(np.asarray(nevs), np.asarray(nevs_1))
    finite = np.isfinite(nlls) & np.isfinite(nlls_1)
    assert np.array_equal(np.isfinite(nlls), np.isfinite(nlls_1))
    np.testing.assert_allclose(nlls[finite], nlls_1[finite], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(thetas)[finite],
                               np.asarray(thetas_1)[finite],
                               rtol=1e-4, atol=1e-6)


def test_truth_executor_modes():
    from gpry_tpu.parallel.executor import TruthExecutor

    class _T:
        def logp(self, x):
            return -float(np.sum(np.asarray(x) ** 2))

    X = np.random.default_rng(0).normal(size=(10, 3))
    expected = np.array([-np.sum(x**2) for x in X])
    for mode in ("serial", "threads"):
        ex = TruthExecutor(_T(), mode=mode)
        out = ex.logp_batch(X)
        assert np.allclose(out, expected)
        ex.shutdown()


def test_runner_truth_executor_dict_spec():
    """Runner accepts {"mode": ..., "max_workers": ...} and
    {"<mode>": {kwargs}} truth_executor specs (the pool must be sizable
    beyond cpu_count for wait-bound likelihoods, e.g. remote or
    I/O-bound truths)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from model_generator import random_gaussian
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=8)
    r1 = Runner(m.loglike, bounds=m.bounds, seed=8, verbose=0,
                truth_executor={"mode": "threads", "max_workers": 3})
    assert r1.executor.mode == "threads" and r1.executor.max_workers == 3
    r1.executor.shutdown()
    r2 = Runner(m.loglike, bounds=m.bounds, seed=8, verbose=0,
                truth_executor={"threads": {"max_workers": 2}})
    assert r2.executor.mode == "threads" and r2.executor.max_workers == 2
    r2.executor.shutdown()


def test_runner_with_thread_executor():
    """The loop works with host-parallel truth evaluation (the analogue of
    the reference's MPI-parallel _eval_truth_parallel)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from model_generator import random_gaussian
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=8)
    runner = Runner(m.loglike, bounds=m.bounds, seed=8, verbose=1,
                    truth_executor="threads",
                    options={"max_total": 16, "max_initial": 10},
                    convergence_criterion="DontConverge")
    runner.run()
    assert runner.gpr.n_total >= 14


def test_mpi_shim_single_process():
    from gpry_tpu import mpi
    assert mpi.is_main_process and not mpi.multiple_processes
    assert mpi.bcast(42) == 42
    assert mpi.gather(3) == [3]
    assert mpi.allgather("x") == ["x"]
    np.testing.assert_array_equal(
        mpi.split_number_for_parallel_processes(10, 3),
        np.array([4, 3, 3]))
    idx = mpi.step_split(10, rank=1, n_proc=3)
    np.testing.assert_array_equal(idx, [1, 4, 7])
    parts = [mpi.step_split(10, rank=r, n_proc=3) for r in range(3)]
    arrays = [np.arange(10)[p] for p in parts]
    merged = mpi.merge_step_split(*arrays, n_proc=3)
    np.testing.assert_array_equal(merged, np.arange(10))


def test_runner_mesh_matches_single_device(mesh8):
    """The production loop dispatches its LML fits and sweeps through the
    mesh-sharded paths when >1 device is up, and produces the SAME training
    trajectory and hyperparameters as single-device execution (the sharding
    is row-/restart-parallel with no cross-shard reductions)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from model_generator import random_gaussian
    from gpry_tpu.run import Runner
    from gpry_tpu.parallel.mesh import SHARD_STATS, mesh_disabled

    def run_once():
        m = random_gaussian(d=2, rng=5)
        runner = Runner(
            m.loglike, bounds=m.bounds, seed=5, verbose=1,
            gp_acquisition={"NORA": {"nlive_max": 48,
                                     "nlive_per_training": 16,
                                     "num_repeats": 6, "mc_every": 2}},
            convergence_criterion=False,
            options={"n_initial": 6, "max_total": 12,
                     "n_points_per_acq": 2},
            mc="uniform")
        runner.run()
        return runner

    stats0 = dict(SHARD_STATS)
    r_mesh = run_once()
    assert SHARD_STATS["fit"] > stats0["fit"], \
        "mesh-sharded LML fit never dispatched"
    assert SHARD_STATS["predict"] > stats0["predict"], \
        "mesh-sharded prediction sweep never dispatched"
    with mesh_disabled():
        r_single = run_once()
    # sharded vs full-batch gemm shapes reassociate reductions: allow ulp
    # noise (~1e-15), which cannot flip the discrete trajectory decisions
    np.testing.assert_allclose(r_mesh.gpr.X_train_all,
                               r_single.gpr.X_train_all,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r_mesh.gpr.y_train_all,
                               r_single.gpr.y_train_all,
                               rtol=1e-10, atol=1e-12)
    # theta: the L-BFGS endpoint amplifies ulp input noise on the flat LML
    # top (trajectory above is identical to 1e-15) — same optimum basin
    np.testing.assert_allclose(r_mesh.gpr.kernel_theta,
                               r_single.gpr.kernel_theta, rtol=1e-4)


def test_nested_sampler_mesh_matches_single(mesh8, params):
    """NS with the chain batch DP-sharded over the mesh returns the same
    samples as the unsharded run (chains are independent lock-step lanes)."""
    from gpry_tpu.mc.nested import run_nested_device
    from gpry_tpu.mc.samples import surrogate_logp_fn
    dt = params.X.dtype
    lo = jnp.full(4, -1.0, dt)
    hi = jnp.full(4, 2.0, dt)
    key = jax.random.PRNGKey(3)
    logp = surrogate_logp_fn("rbf")
    kw = dict(nlive=48, num_repeats=6, precision_criterion=0.05,
              max_dead=768)
    res_s = run_nested_device(logp, params, key, lo, hi, mesh=mesh8, **kw)
    res_1 = run_nested_device(logp, params, key, lo, hi, mesh=None, **kw)
    assert int(res_s.n_dead) == int(res_1.n_dead)
    np.testing.assert_allclose(np.asarray(res_s.X), np.asarray(res_1.X),
                               atol=1e-12)
    np.testing.assert_allclose(float(res_s.logZ), float(res_1.logZ),
                               rtol=1e-10)


def test_process_executor_with_closure():
    """'processes' mode must work with closure/lambda likelihoods — the
    common case — via cloudpickle (round-1 weak #4: stock pickling broke)."""
    from gpry_tpu.parallel.executor import TruthExecutor

    offset = np.array([1.5, -0.5, 0.25])

    class _T:
        pass

    t = _T()
    t.logp = lambda x: -float(np.sum((np.asarray(x) - offset) ** 2))
    X = np.random.default_rng(1).normal(size=(6, 3))
    expected = np.array([-np.sum((x - offset) ** 2) for x in X])
    ex = TruthExecutor(t, mode="processes", max_workers=2)
    try:
        out = ex.logp_batch(X)
    finally:
        ex.shutdown()
    np.testing.assert_allclose(out, expected)


def test_runner_nonroot_rank_waits(monkeypatch, tmp_path):
    """Under a multi-rank MPI world, non-root ranks must NOT duplicate the
    loop: they wait at the barrier and re-sync from the checkpoint
    (round-1 weak #9)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from model_generator import random_gaussian
    from gpry_tpu import mpi
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=9)
    ckpt = str(tmp_path / "mpi_ckpt")
    # root run writes the checkpoint
    r0 = Runner(m.loglike, bounds=m.bounds, seed=9, verbose=1,
                options={"max_total": 14, "max_initial": 10},
                convergence_criterion="DontConverge",
                checkpoint=ckpt, load_checkpoint="overwrite")
    r0.run()
    n_expected = r0.gpr.n_total

    barriers = []
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", False)
    monkeypatch.setattr(mpi, "RANK", 1)
    monkeypatch.setattr(mpi, "sync_processes", lambda: barriers.append(1))
    truth_evals = {"n": 0}

    def counting_loglike(x):
        truth_evals["n"] += 1
        return m.loglike(x)

    r1 = Runner(counting_loglike, bounds=m.bounds, seed=9, verbose=1,
                options={"max_total": 14, "max_initial": 10},
                convergence_criterion="DontConverge",
                checkpoint=ckpt, load_checkpoint="resume")
    r1.run()
    assert barriers == [1]              # waited at the barrier
    assert truth_evals["n"] == 0        # did NOT duplicate the loop
    assert r1.gpr.n_total == n_expected  # state re-synced from checkpoint


class _FakeComm4:
    """Controller-side fake of a 4-rank MPI world: rank 0 is the live
    process; ranks 1-3 are simulated by evaluating their slices inline
    with per-rank eval counters."""

    def __init__(self, worker_truths):
        self.cmds = []
        self.worker_truths = worker_truths  # rank -> truth-like object

    def bcast(self, value, root=0):
        self.cmds.append(value)
        return value

    def gather(self, value, root=0):
        from gpry_tpu.parallel.executor import TruthExecutor
        cmd = self.cmds[-1]
        assert cmd[0] == "eval"
        X = np.atleast_2d(cmd[1])
        out = [value]
        for rank in (1, 2, 3):
            ex = TruthExecutor(self.worker_truths[rank], mode="serial")
            out.append(ex._eval_slice(X, rank, 4))
        return out


def test_mpi_truth_executor_distributes_4way(monkeypatch):
    """mode='mpi': a batch is contiguously split over the 4-rank world and
    re-concatenated in order (the reference's _eval_truth_parallel
    decomposition, gpry/run.py:1200-1236)."""
    from gpry_tpu import mpi
    from gpry_tpu.parallel.executor import TruthExecutor

    class _T:
        def __init__(self):
            self.n = 0

        def logp(self, x):
            self.n += 1
            return -float(np.sum(np.asarray(x) ** 2))

    worker_truths = {r: _T() for r in (1, 2, 3)}
    comm = _FakeComm4(worker_truths)
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", True)
    monkeypatch.setattr(mpi, "RANK", 0)
    monkeypatch.setattr(mpi, "SIZE", 4)
    monkeypatch.setattr(mpi, "mpi_comm", comm)

    t0 = _T()
    ex = TruthExecutor(t0, mode="mpi")
    X = np.random.default_rng(0).normal(size=(10, 3))
    out = ex.logp_batch(X)
    expected = np.array([-np.sum(x**2) for x in X])
    np.testing.assert_allclose(out, expected)
    # 10 points over 4 ranks: contiguous split [3, 3, 2, 2]
    assert t0.n == 3
    assert [worker_truths[r].n for r in (1, 2, 3)] == [3, 2, 2]


def test_mpi_executor_worker_serves(monkeypatch):
    """serve(): a worker rank evaluates ITS slice of every broadcast batch
    until the stop command."""
    from gpry_tpu import mpi
    from gpry_tpu.parallel.executor import TruthExecutor

    X = np.arange(20, dtype=float).reshape(10, 2)

    class _WorkerComm:
        def __init__(self):
            self.commands = [("eval", X), ("stop",)]
            self.gathered = []

        def bcast(self, value, root=0):
            return self.commands.pop(0)

        def gather(self, value, root=0):
            self.gathered.append(value)
            return None  # non-root gets None

    comm = _WorkerComm()
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", False)
    monkeypatch.setattr(mpi, "RANK", 2)
    monkeypatch.setattr(mpi, "SIZE", 4)
    monkeypatch.setattr(mpi, "mpi_comm", comm)

    class _T:
        def logp(self, x):
            return float(x[0])

    ex = TruthExecutor(_T(), mode="mpi")
    ex.serve()  # returns on the stop command
    # rank 2 of 4 over 10 items: offsets [0,3,6,8,10] -> rows 6,7
    assert comm.gathered == [[12.0, 14.0]]


def test_mpi_executor_error_raises_after_gather(monkeypatch):
    """mode='mpi': an exception in the controller's own slice must still
    complete the gather collective (or the workers would deadlock in
    theirs) and then raise on rank 0."""
    from gpry_tpu import mpi
    from gpry_tpu.parallel.executor import TruthExecutor

    class _T:
        def logp(self, x):
            return -float(np.sum(np.asarray(x) ** 2))

    class _Boom:
        def logp(self, x):
            raise RuntimeError("user loglike exploded")

    worker_truths = {r: _T() for r in (1, 2, 3)}
    comm = _FakeComm4(worker_truths)
    gathers = []
    orig_gather = comm.gather
    comm.gather = lambda v, root=0: (gathers.append(v),
                                     orig_gather(v, root=root))[1]
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", True)
    monkeypatch.setattr(mpi, "RANK", 0)
    monkeypatch.setattr(mpi, "SIZE", 4)
    monkeypatch.setattr(mpi, "mpi_comm", comm)

    ex = TruthExecutor(_Boom(), mode="mpi")
    X = np.random.default_rng(0).normal(size=(10, 3))
    with pytest.raises(RuntimeError, match="rank 0.*exploded"):
        ex.logp_batch(X)
    # the collective completed: rank 0 contributed an error marker
    assert len(gathers) == 1
    assert gathers[0][0] == "__truth_error__"


def test_mpi_executor_worker_serves_through_error(monkeypatch):
    """serve(): a worker whose slice raises ships an error marker through
    the gather and KEEPS serving (later collectives stay aligned) until
    the stop command."""
    from gpry_tpu import mpi
    from gpry_tpu.parallel.executor import TruthExecutor

    X = np.arange(20, dtype=float).reshape(10, 2)

    class _WorkerComm:
        def __init__(self):
            self.commands = [("eval", X), ("eval", X), ("stop",)]
            self.gathered = []

        def bcast(self, value, root=0):
            return self.commands.pop(0)

        def gather(self, value, root=0):
            self.gathered.append(value)
            return None

    comm = _WorkerComm()
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", False)
    monkeypatch.setattr(mpi, "RANK", 2)
    monkeypatch.setattr(mpi, "SIZE", 4)
    monkeypatch.setattr(mpi, "mpi_comm", comm)

    class _FlakyT:
        def __init__(self):
            self.calls = 0

        def logp(self, x):
            self.calls += 1
            if self.calls == 1:  # first batch's slice fails fast
                raise ValueError("bad point")
            return float(x[0])

    ex = TruthExecutor(_FlakyT(), mode="mpi")
    ex.serve()  # must reach the stop command without raising
    assert len(comm.gathered) == 2
    assert comm.gathered[0][0] == "__truth_error__"
    assert "rank 2" in comm.gathered[0][1]
    # second batch evaluated normally after the error
    assert comm.gathered[1] == [12.0, 14.0]


def test_runner_mpi_executor_end_to_end(monkeypatch):
    """Runner(truth_executor='mpi') under a (fake) 4-rank world: the loop
    stays single-controller on rank 0 but every truth batch distributes
    4-way; the loop end releases the workers with a stop broadcast."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from model_generator import random_gaussian
    from gpry_tpu import mpi
    from gpry_tpu.run import Runner

    m = random_gaussian(d=2, rng=12)

    class _WT:
        def __init__(self):
            self.n = 0

        def logp(self, x):
            self.n += 1
            return m.loglike(x)

    worker_truths = {r: _WT() for r in (1, 2, 3)}
    comm = _FakeComm4(worker_truths)
    monkeypatch.setattr(mpi, "multiple_processes", True)
    monkeypatch.setattr(mpi, "is_main_process", True)
    monkeypatch.setattr(mpi, "RANK", 0)
    monkeypatch.setattr(mpi, "SIZE", 4)
    monkeypatch.setattr(mpi, "mpi_comm", comm)
    monkeypatch.setattr(mpi, "sync_processes", lambda: None)

    root_evals = {"n": 0}

    def loglike(x):
        root_evals["n"] += 1
        return m.loglike(x)

    runner = Runner(loglike, bounds=m.bounds, seed=12, verbose=1,
                    truth_executor="mpi",
                    options={"max_total": 16, "max_initial": 12,
                             "n_points_per_acq": 4},
                    convergence_criterion="DontConverge")
    runner.run()
    worker_n = sum(t.n for t in worker_truths.values())
    assert worker_n > 0, "no truth evals distributed to worker ranks"
    # rank 0 must NOT have evaluated everything itself
    assert root_evals["n"] < runner.gpr.n_total
    assert root_evals["n"] + worker_n == runner.gpr.n_total
    # the loop end released the workers
    assert comm.cmds[-1][0] == "stop"


def test_tp_predict_matches_surrogate_predict(mesh8, params):
    """TP (training-axis) gated prediction must reproduce the single-device
    surrogate_predict results (same gates, K^-1 quadratic form for std)."""
    from gpry_tpu.parallel.mesh import tp_predict

    rng = np.random.default_rng(4)
    Xq = jnp.asarray(rng.uniform(size=(16, 4)), params.X.dtype)
    mean_tp, std_tp = tp_predict("rbf", params, Xq, mesh8)
    mean, std = surrogate_predict("rbf", params, Xq)
    np.testing.assert_allclose(np.asarray(mean_tp), np.asarray(mean),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(std_tp), np.asarray(std),
                               rtol=1e-6, atol=1e-9)


def test_predict_maybe_sharded_routes_tp(mesh8, params, monkeypatch):
    """Small query batches + large training buffers route through the TP
    path (SHARD_STATS['tp'] increments) with identical results."""
    from gpry_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod, "TP_NMAX_MIN", 64)  # fixture nmax = 64
    rng = np.random.default_rng(5)
    Xq = jnp.asarray(rng.uniform(size=(8, 4)), params.X.dtype)
    tp0 = mesh_mod.SHARD_STATS["tp"]
    mean, std = mesh_mod.predict_maybe_sharded("rbf", params, Xq)
    assert mesh_mod.SHARD_STATS["tp"] == tp0 + 1
    mean_1, std_1 = surrogate_predict("rbf", params, Xq)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_1),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(std), np.asarray(std_1),
                               rtol=1e-6, atol=1e-9)


def test_tp_predict_applies_gates(mesh8, params):
    """TP path must apply the same trust-region/clip gates as
    surrogate_predict (SVM/trust/clip run in the replicated pass)."""
    from gpry_tpu.parallel.mesh import tp_predict

    p = params._replace(
        trust_lo=jnp.full(4, 0.2, params.X.dtype),
        trust_hi=jnp.full(4, 0.8, params.X.dtype),
        clip_max=jnp.asarray(0.5, params.X.dtype))
    rng = np.random.default_rng(6)
    Xq = jnp.asarray(rng.uniform(size=(12, 4)), params.X.dtype)
    mean_tp, std_tp = tp_predict("rbf", p, Xq, mesh8)
    mean, std = surrogate_predict("rbf", p, Xq)
    np.testing.assert_allclose(np.asarray(mean_tp), np.asarray(mean),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(std_tp), np.asarray(std),
                               rtol=1e-6, atol=1e-9)
    # the gates really fired: some queries are outside the trust box
    assert np.any(np.asarray(mean_tp) == -np.inf)
    assert np.all(np.asarray(mean_tp)[np.isfinite(np.asarray(mean_tp))]
                  <= 0.5 + 1e-12)
