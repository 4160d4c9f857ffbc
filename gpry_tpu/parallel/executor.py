"""
Host-side parallel truth evaluation.

The reference parallelizes user-likelihood evaluations by splitting batches
across MPI ranks (gpry/run.py:1200-1236, gpry/mpi.py:80-102).  In the
single-controller TPU design the only genuinely host-bound work is this
user-Python callable, so it runs in a local executor instead: serial by
default (zero overhead for fast likelihoods), thread pool for I/O-bound or
GIL-releasing likelihoods, process pool (dill-pickled) for CPU-bound ones.
"""

import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

# Worker-side cache of deserialized likelihood callables, keyed by payload
# hash: the closure is shipped once as cloudpickle bytes (stock pickle
# cannot carry lambdas/closures — the common case for user likelihoods) and
# materialized once per worker process.
_WORKER_FNS = {}


def _call_pickled(payload, x):
    import cloudpickle
    key = hash(payload)
    fn = _WORKER_FNS.get(key)
    if fn is None:
        fn = cloudpickle.loads(payload)
        _WORKER_FNS[key] = fn
    return fn(x)


class TruthExecutor:
    """
    Evaluate ``truth.logp`` over batches of points.

    Parameters
    ----------
    mode : "serial" (default), "threads", or "processes"
    max_workers : int, optional (default: CPU count)
    """

    def __init__(self, truth, mode="serial", max_workers=None):
        self.truth = truth
        self.mode = mode
        self.max_workers = max_workers or min(32, (os.cpu_count() or 1))
        self._pool = None
        self._payload = None
        if mode == "threads":
            self._pool = ThreadPoolExecutor(max_workers=self.max_workers)
        elif mode == "processes":
            # cloudpickle the callable so closures/lambdas cross the
            # process boundary (the reference uses dill for the same
            # reason, gpry/mpi.py:7-11)
            import cloudpickle
            self._payload = cloudpickle.dumps(truth.logp)
            self._pool = ProcessPoolExecutor(max_workers=self.max_workers)
        elif mode != "serial":
            raise ValueError(f"Unknown executor mode '{mode}'.")

    def logp_batch(self, X):
        """Evaluate the truth at each row of X, returning an array."""
        X = np.atleast_2d(X)
        if self._pool is None:
            return np.array([self.truth.logp(x) for x in X])
        if self._payload is not None:
            futures = [self._pool.submit(_call_pickled, self._payload, x)
                       for x in X]
        else:
            futures = [self._pool.submit(self.truth.logp, x) for x in X]
        return np.array([f.result() for f in futures])

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.shutdown()
        except Exception:
            pass
