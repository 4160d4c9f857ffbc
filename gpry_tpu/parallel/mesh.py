"""
Multi-chip sharding over a jax device Mesh.

The reference's parallelism is MPI task-parallelism over batch axes
(restarts, Kriging-believer candidates, NS-sample rows — SURVEY.md section
2.2 / gpry/mpi.py).  The TPU-native equivalents, over ICI instead of MPI:

* **DP (data parallel)** over the candidate/sample axis: acquisition and
  prediction sweeps are sharded row-wise with ``shard_map``; no collectives
  needed (embarrassingly parallel), results gathered by the out_spec.
* **DP over optimizer restarts**: the vmapped multi-start LML fit / acq
  ascent shards its restart axis; the best-of reduction is a tiny
  ``argmin`` after an implicit all-gather.
* **TP (tensor/model parallel)** over the *training-point* axis for the
  predictive mean: K(Xq, X) columns and alpha are sharded, each device
  computes a partial matvec, combined with ``psum`` — the analogue of
  sharding the kernel matrix when N grows.

Single-chip execution is the degenerate mesh; the same code paths run.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpry_tpu.models.gp import surrogate_predict
from gpry_tpu.ops.kernels import cross_kernel
from gpry_tpu.ops.lbfgs import minimize_lbfgs_bounded
from gpry_tpu.ops.linalg import masked_lml


def make_mesh(devices=None, axis_name="data"):
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_to_multiple(X, m, axis=0):
    """Pad axis length up to a multiple of m; returns (padded, n_valid)."""
    n = X.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return X, n
    widths = [(0, 0)] * X.ndim
    widths[axis] = (0, pad)
    return jnp.pad(X, widths), n


def sharded_predict(family, p, Xq, mesh, axis_name="data"):
    """
    DP prediction: rows of Xq sharded over the mesh.  Xq's leading dim must
    be a multiple of the mesh size (use pad_to_multiple).
    """

    def local(Xq_shard):
        return surrogate_predict(family, p, Xq_shard)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(axis_name, None),),
                   out_specs=(P(axis_name), P(axis_name)),
                   check_vma=False)
    return fn(Xq)


def sharded_fit_restarts(family, X, y, n, noise_var, theta0s, lo, hi,
                         mesh, axis_name="data", maxiter=100):
    """
    DP hyperparameter fit: restarts sharded over the mesh (the TPU analogue
    of the reference's MPI-split restarts, gpry/run.py:1253-1293).
    Returns (thetas, nlls) gathered over all restarts.
    """

    def local(theta0s_shard):
        def nll(theta):
            return -masked_lml(family, theta, X, y, n, noise_var)

        solve = lambda t0: minimize_lbfgs_bounded(nll, t0, lo, hi,
                                                  maxiter=maxiter)
        return jax.vmap(solve)(theta0s_shard)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(axis_name, None),),
                   out_specs=(P(axis_name, None), P(axis_name)),
                   check_vma=False)
    return fn(theta0s)


def tp_predict_mean(family, theta, X, alpha, n, x_loc, x_scale, y_loc,
                    y_scale, Xq, mesh, axis_name="data"):
    """
    TP predictive mean: the *training-point* axis of (X, alpha) is sharded;
    each device computes its partial K(Xq, X_shard) @ alpha_shard and the
    partials are reduced with ``psum`` over ICI.  The padded-buffer design
    makes this exact: masked-out rows carry alpha = 0.
    """

    def local(X_shard, alpha_shard, row0):
        Xq_ = (Xq - x_loc) / x_scale
        nmax_local = X_shard.shape[0]
        idx = row0[0] + jnp.arange(nmax_local)
        m = (idx < n).astype(X_shard.dtype)
        K = cross_kernel(family, theta, Xq_, X_shard) * m[None, :]
        partial_mean = K @ alpha_shard
        mean_ = jax.lax.psum(partial_mean, axis_name)
        return mean_ * y_scale + y_loc

    nmax = X.shape[0]
    n_dev = mesh.shape[axis_name]
    row_starts = (jnp.arange(n_dev) * (nmax // n_dev))[:, None]
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name, None)),
        out_specs=P(None),
        check_vma=False,
    )
    return fn(X, alpha, row_starts)


def device_put_sharded_rows(X, mesh, axis_name="data"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(X, NamedSharding(mesh, P(axis_name)))
