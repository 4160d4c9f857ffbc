"""
Pallas TPU kernels for the hot prediction path.

The single most-executed computation in the framework is the surrogate
sweep: evaluate the GP posterior mean (and variance) at a large batch of
candidate points (nested-sampling proposals, acquisition ranking,
convergence MC) against the padded training set.  The XLA path materializes
the (nq, nmax) cross-covariance in HBM between the distance computation and
the matvec; the Pallas kernel below fuses RBF covariance construction with
the alpha-matvec so each K tile lives only in VMEM.

float32 only (the f64 path keeps the XLA implementation); used for the
bulk candidate sweeps where f32 is ample.  Falls back to XLA off-TPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256   # query rows per program
TILE_N = 256   # training rows per inner step


def _fused_mean_kernel(xq_ref, xt_ref, alpha_ref, ls_ref, var_ref, out_ref,
                       acc_ref):
    """
    One (TILE_Q, TILE_N) tile: K = var * exp(-0.5 ||(xq - xt)/ls||^2),
    accumulate K @ alpha_tile into the output accumulator.

    Grid: (n_q_tiles, n_n_tiles); the N axis is the reduction axis, so the
    accumulator is zeroed at j == 0 and written out at the last j.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]            # (TILE_Q, d)
    xt = xt_ref[:]            # (TILE_N, d)
    ls = ls_ref[0, :]         # (d,)
    var = var_ref[0, 0]
    d = xq.shape[-1]
    # unrolled 2-D distance accumulation (d is small and static)
    sq = jnp.zeros((xq.shape[0], xt.shape[0]), jnp.float32)
    for k in range(d):
        dk = (xq[:, k] / ls[k])[:, None] - (xt[:, k] / ls[k])[None, :]
        sq += dk * dk
    kmat = var * jnp.exp(-0.5 * sq)
    acc_ref[:] += kmat @ alpha_ref[:]

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=())
def fused_predict_mean_f32(theta, X, alpha, Xq):
    """
    Fused RBF posterior mean: ``K(Xq, X) @ alpha`` with on-the-fly
    covariance, f32.  ``X``/``alpha`` are the padded training buffers
    (masked rows must carry alpha = 0, which the padded design guarantees).
    Shapes must be multiples of the tile sizes; pad with zeros otherwise
    (zero-padded alpha rows contribute nothing).
    """
    Xq = Xq.astype(jnp.float32)
    X = X.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    nq, d = Xq.shape
    nmax = X.shape[0]
    pad_q = (-nq) % TILE_Q
    pad_n = (-nmax) % TILE_N
    if pad_q:
        Xq = jnp.pad(Xq, ((0, pad_q), (0, 0)))
    if pad_n:
        X = jnp.pad(X, ((0, pad_n), (0, 0)))
        alpha = jnp.pad(alpha, (0, pad_n))
    var = jnp.exp(theta[0]).astype(jnp.float32).reshape(1, 1)
    ls = jnp.exp(theta[1:]).astype(jnp.float32).reshape(1, -1)
    nq_p, nmax_p = Xq.shape[0], X.shape[0]
    grid = (nq_p // TILE_Q, nmax_p // TILE_N)
    out = pl.pallas_call(
        _fused_mean_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_Q,), lambda i, j: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_p,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_Q,), jnp.float32)],
    )(Xq, X, alpha, ls, var)
    return out[:nq]
