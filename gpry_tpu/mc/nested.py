"""
On-device vectorized nested sampling.

TPU-native replacement for the reference's external nested samplers
(PolyChord / UltraNest / nessai behind gpry/ns_interfaces.py:36-543): the
GP surrogate is cheap and jittable, so the whole NS run — live-point
evolution, constrained slice sampling, evidence bookkeeping — executes as a
single ``lax.while_loop`` on device with fixed shapes.

Algorithm: batched nested sampling with PolyChord-style constrained slice
sampling (arXiv:1506.00171's search strategy, vectorized):

* ``nlive`` live points; each outer step kills the ``B`` worst and replaces
  them with ``B`` vmapped slice-sampling chains started from random
  survivors, each doing ``num_repeats`` passes along directions drawn from
  the live-point covariance Cholesky (whitened slice sampling).
* Volume bookkeeping uses the deterministic approximation
  ``log X_i = -(i+1)/nlive`` per (likelihood-sorted) dead point; dead-point
  weights ``log w_i = logl_i - i/nlive + log(expm1(1/nlive))``.
* Stops when the live-point evidence upper bound falls below
  ``precision_criterion`` of the total (reference target 0.01,
  gpry/gp_acquisition.py:615).

The log-density callable is the *gated* surrogate mean (-inf outside the
classifier/trust region), plus a hard -inf outside the prior box.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


class NSResult(NamedTuple):
    X: jnp.ndarray        # (max_dead + nlive, d): dead points then live
    logl: jnp.ndarray     # (max_dead + nlive,)
    logw: jnp.ndarray     # (max_dead + nlive,) unnormalized log-weights
    n_dead: jnp.ndarray   # () int32: valid dead entries
    logZ: jnp.ndarray     # () evidence estimate
    n_calls: jnp.ndarray  # () int32: log-density evaluations


def _slice_chain(logl_fn, params, key, x0, logl0, lstar, chol, num_repeats,
                 lo, hi):
    """
    One constrained slice-sampling chain from (x0, logl0 > lstar):
    ``num_repeats`` slice updates along covariance-whitened directions.
    Returns (x, logl, n_calls).  Fully jittable; vmapped over chains.
    """
    d = x0.shape[0]

    def in_box(x):
        return jnp.all((x >= lo) & (x <= hi))

    def eval_logl(x):
        return jnp.where(in_box(x), logl_fn(params, x[None])[0], -jnp.inf)

    def one_repeat(carry, key_r):
        x, lx, calls = carry
        k1, k2, k3 = jax.random.split(key_r, 3)
        nrm = jax.random.normal(k1, (d,), x.dtype)
        e = chol @ (nrm / jnp.linalg.norm(nrm))

        # Step-out by doubling, capped (directions are covariance-scaled, so
        # the unit interval is already the right order of magnitude).  The
        # endpoint log-densities ride in the carry so the condition does not
        # re-evaluate the GP.
        w0 = jax.random.uniform(k2, dtype=x.dtype) * 0.9 + 0.05
        tlo0, thi0 = -w0, 1.0 - w0

        def expand(state):
            tlo, thi, l_lo, l_hi, it, calls = state
            tlo = jnp.where(l_lo > lstar, tlo * 2.0, tlo)
            thi = jnp.where(l_hi > lstar, thi * 2.0, thi)
            l_lo = eval_logl(x + tlo * e)
            l_hi = eval_logl(x + thi * e)
            return tlo, thi, l_lo, l_hi, it + 1, calls + 2

        def expand_cond(state):
            tlo, thi, l_lo, l_hi, it, _ = state
            return ((l_lo > lstar) | (l_hi > lstar)) & (it < 6)

        tlo, thi, _, _, _, calls = jax.lax.while_loop(
            expand_cond, expand,
            (tlo0, thi0, eval_logl(x + tlo0 * e), eval_logl(x + thi0 * e),
             0, calls + 2))

        # Shrinkage sampling.
        def shrink(state):
            key, tlo, thi, t, lx_new, accepted, it, calls = state
            key, kk = jax.random.split(key)
            t = jax.random.uniform(kk, dtype=x.dtype,
                                   minval=tlo, maxval=thi)
            l_new = eval_logl(x + t * e)
            accepted = l_new > lstar
            tlo = jnp.where(~accepted & (t < 0), t, tlo)
            thi = jnp.where(~accepted & (t >= 0), t, thi)
            return key, tlo, thi, t, l_new, accepted, it + 1, calls + 1

        def shrink_cond(state):
            _, _, _, _, _, accepted, it, _ = state
            return (~accepted) & (it < 30)

        key_s, tlo, thi, t, l_new, accepted, _, calls = jax.lax.while_loop(
            shrink_cond, shrink,
            (k3, tlo, thi, jnp.zeros((), x.dtype), lx, False, 0, calls))
        x_new = jnp.where(accepted, x + t * e, x)
        lx_new = jnp.where(accepted, l_new, lx)
        return (x_new, lx_new, calls), None

    keys = jax.random.split(key, num_repeats)
    (x, lx, calls), _ = jax.lax.scan(one_repeat, (x0, logl0, 0), keys)
    return x, lx, calls


@partial(jax.jit,
         static_argnames=("logl_fn", "nlive", "num_repeats", "max_dead",
                          "kill_batch"))
def run_nested_device(logl_fn, params, key, lo, hi, nlive=200,
                      num_repeats=10, precision_criterion=0.01,
                      max_dead=5000, kill_batch=None):
    """
    Run nested sampling on device.  ``logl_fn(params, X)`` is a jittable
    ``(nq, d) -> (nq,)`` log-density (e.g. the gated surrogate mean); it must
    be a *module-level function* (stable identity, so jit caches across
    calls) with all changing state in the traced ``params`` pytree.
    Uniform prior on the box [lo, hi].
    """
    d = lo.shape[0]
    dtype = lo.dtype
    if kill_batch is None:
        kill_batch = max(1, nlive // 6)
    B = int(kill_batch)

    k0, key = jax.random.split(key)
    live_X = jax.random.uniform(k0, (nlive, d), dtype) * (hi - lo) + lo
    live_logl = logl_fn(params, live_X)

    dead_X = jnp.zeros((max_dead, d), dtype)
    dead_logl = jnp.full((max_dead,), -jnp.inf, dtype)

    log_shell = jnp.log(jnp.expm1(1.0 / nlive))  # log(X_{i-1} - X_i) + i/nlive

    def logz_dead(dead_logl, k):
        idx = jnp.arange(max_dead)
        logw = dead_logl - idx / nlive + log_shell
        logw = jnp.where(idx < k, logw, -jnp.inf)
        return logsumexp(logw)

    def outer_cond(state):
        key, live_X, live_logl, dead_X, dead_logl, k, calls = state
        logz_d = logz_dead(dead_logl, k)
        logx = -k.astype(dtype) / nlive
        logz_live = logsumexp(live_logl) - jnp.log(float(nlive)) + logx
        logz_tot = jnp.logaddexp(logz_d, logz_live)
        not_converged = (logz_live - logz_tot) > jnp.log(precision_criterion)
        has_room = k + B <= max_dead
        # plateau stop: if all live points share (numerically) the same
        # log-density — e.g. the surrogate's clipped flat top — further
        # compression gains nothing and the evidence criterion can never
        # trigger.
        spread = jnp.max(live_logl) - jnp.min(live_logl)
        plateau = (k > nlive) & jnp.isfinite(spread) & \
            (spread < 1e-9 * jnp.maximum(1.0, jnp.abs(jnp.max(live_logl))))
        # keep going while not converged (or nothing finite yet) and room
        return (not_converged | jnp.isinf(logz_tot)) & has_room & ~plateau

    def outer_body(state):
        key, live_X, live_logl, dead_X, dead_logl, k, calls = state
        key, k_pick, k_chains = jax.random.split(key, 3)

        order = jnp.argsort(live_logl)
        kill_idx = order[:B]
        survive_idx = order[B:]
        lstar = live_logl[order[B - 1]]

        # record dead points in ascending-logl order
        dead_X = jax.lax.dynamic_update_slice(
            dead_X, live_X[kill_idx], (k, jnp.zeros((), k.dtype)))
        dead_logl = jax.lax.dynamic_update_slice(
            dead_logl, live_logl[kill_idx], (k,))

        # covariance-whitened directions from survivors
        Xs = live_X[survive_idx]
        mu = jnp.mean(Xs, axis=0)
        diff = Xs - mu
        cov = diff.T @ diff / (nlive - B) + 1e-12 * jnp.eye(d, dtype=dtype)
        chol = jnp.linalg.cholesky(cov)

        starts = jax.random.choice(k_pick, nlive - B, (B,), replace=True)
        x0s = Xs[starts]
        l0s = live_logl[survive_idx][starts]
        chain_keys = jax.random.split(k_chains, B)
        xs, ls, cs = jax.vmap(
            lambda kk, x0, l0: _slice_chain(
                logl_fn, params, kk, x0, l0, lstar, chol, num_repeats,
                lo, hi)
        )(chain_keys, x0s, l0s)

        live_X = live_X.at[kill_idx].set(xs)
        live_logl = live_logl.at[kill_idx].set(ls)
        return (key, live_X, live_logl, dead_X, dead_logl, k + B,
                calls + jnp.sum(cs).astype(calls.dtype))

    state = (key, live_X, live_logl, dead_X, dead_logl,
             jnp.asarray(0, jnp.int32), jnp.asarray(nlive, jnp.int32))
    key, live_X, live_logl, dead_X, dead_logl, k, calls = \
        jax.lax.while_loop(outer_cond, outer_body, state)

    # Assemble weighted samples: dead points + final live points.
    idx = jnp.arange(max_dead)
    dead_logw = jnp.where(
        idx < k, dead_logl - idx / nlive + log_shell, -jnp.inf)
    logx_final = -k.astype(dtype) / nlive
    live_logw = live_logl + logx_final - jnp.log(float(nlive))
    X_all = jnp.concatenate([dead_X, live_X], axis=0)
    logl_all = jnp.concatenate([dead_logl, live_logl])
    logw_all = jnp.concatenate([dead_logw, live_logw])
    logZ = logsumexp(logw_all)
    return NSResult(X=X_all, logl=logl_all, logw=logw_all, n_dead=k,
                    logZ=logZ, n_calls=calls)
