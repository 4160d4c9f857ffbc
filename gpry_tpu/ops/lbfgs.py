"""
Vmappable bound-constrained L-BFGS.

Replaces the reference's scipy ``fmin_l_bfgs_b`` calls — GP hyperparameter
fits (gpry/gpr.py:1435-1445) and acquisition optimization
(gpry/gp_acquisition.py:502-510) — whose multi-start restarts the reference
splits across MPI ranks.  Here a single ``jax.vmap`` runs *all* restarts as
one batched device computation.

Box constraints are handled with a sigmoid reparametrization
``x = lo + (hi - lo) * sigmoid(u)``: the optimizer runs unconstrained in u,
which keeps the whole solve jittable (no projection corner cases), at the
price of asymptotic (never exact) attainment of the bounds — irrelevant here
since all optima of interest are interior or forgiving of ~1e-6 slack.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

_SIGMOID_CLIP = 15.0  # |u| cap: sigmoid(15) differs from 1 by ~3e-7


def to_unconstrained(x, lo, hi):
    """Map x in (lo, hi) to the unconstrained u-space."""
    t = jnp.clip((x - lo) / (hi - lo), 1e-9, 1 - 1e-9)
    return jnp.clip(jnp.log(t) - jnp.log1p(-t), -_SIGMOID_CLIP, _SIGMOID_CLIP)


def to_constrained(u, lo, hi):
    """Map unconstrained u to x in (lo, hi)."""
    return lo + (hi - lo) * jax.nn.sigmoid(
        jnp.clip(u, -_SIGMOID_CLIP, _SIGMOID_CLIP))


def minimize_lbfgs(fun, x0, maxiter=100, tol=1e-8, memory_size=10,
                   max_linesearch_steps=30):
    """
    Minimize ``fun`` (scalar, differentiable) from ``x0``.  Returns
    ``(x_opt, f_opt)``.  Fully jittable and vmappable.

    Non-finite objective values at intermediate points are tolerated by the
    zoom linesearch (it backtracks); a non-finite value *at the start point*
    yields (x0, +inf).
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps),
    )
    value_and_grad = optax.value_and_grad_from_state(fun)

    def body(carry):
        x, state, it, _ = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        gnorm = optax.tree.norm(grad)
        return x, state, it + 1, gnorm

    def cond(carry):
        _, _, it, gnorm = carry
        return (it < maxiter) & (gnorm > tol)

    state0 = opt.init(x0)
    # Do-while: the initial optimizer state has zero grad, so run one step
    # before testing the gradient-norm condition.
    carry = body((x0, state0, 0, jnp.asarray(jnp.inf, x0.dtype)))
    x, _, _, _ = jax.lax.while_loop(cond, body, carry)
    f = fun(x)
    bad = ~jnp.isfinite(f)
    x = jnp.where(bad, x0, x)
    f = jnp.where(bad, fun(x0), f)
    return x, f


def minimize_lbfgs_bounded(fun, x0, lo, hi, maxiter=100, tol=1e-8, **kw):
    """
    Box-constrained minimization via the sigmoid reparametrization.
    Returns ``(x_opt, f_opt)`` with x_opt strictly inside [lo, hi].
    """
    u0 = to_unconstrained(x0, lo, hi)
    fun_u = lambda u: fun(to_constrained(u, lo, hi))
    u_opt, f_opt = minimize_lbfgs(fun_u, u0, maxiter=maxiter, tol=tol, **kw)
    return to_constrained(u_opt, lo, hi), f_opt


@partial(jax.jit, static_argnames=("fun", "maxiter"))
def multistart_minimize(fun, x0s, lo, hi, maxiter=100, tol=1e-8):
    """
    Vmapped multi-start bounded minimization.  ``x0s`` has shape (R, d).
    Returns ``(xs (R, d), fs (R,))`` — one result per restart; the caller
    picks the argmin (like the reference's best-LML / best-acquisition
    selection across MPI ranks, gpry/run.py:1286-1293).
    """
    solve = lambda x0: minimize_lbfgs_bounded(
        fun, x0, lo, hi, maxiter=maxiter, tol=tol)
    return jax.vmap(solve)(x0s)
