"""
Covariance (kernel) functions as pure JAX functions.

Unlike the reference's class hierarchy over scikit-learn kernels
(gpry/kernels.py:213-709), the TPU build keeps kernels as *pure functions of
a log-hyperparameter vector theta*, so that hyperparameter gradients (for the
log-marginal-likelihood fit) and input-space gradients (for gradient-based
acquisition optimization) both come from ``jax.grad`` instead of hand-coded
formulas, and the covariance construction is a single fused XLA computation
that maps onto the MXU via the squared-distance matmul trick.

theta layout (log space, matching sklearn's ``kernel_.theta`` convention for
``ConstantKernel() * {RBF|Matern}(length_scale=[...]*d)``):

    theta[0]   = log(output_scale**2)     (constant kernel variance)
    theta[1:]  = log(length_scale_i), i = 1..d   (anisotropic)

Supported families: "rbf", "matern12", "matern32", "matern52"
(reference builds C()*RBF or C()*Matern, gpry/gpr.py:328-363).
"""

from functools import partial

import jax
import jax.numpy as jnp

KERNEL_FAMILIES = ("rbf", "matern12", "matern32", "matern52")


def make_theta(output_scale, length_scales):
    """Build a theta vector from natural-space scales."""
    output_scale = jnp.asarray(output_scale)
    length_scales = jnp.atleast_1d(jnp.asarray(length_scales))
    return jnp.concatenate(
        [jnp.log(output_scale**2)[None], jnp.log(length_scales)]
    )


def _scaled_sqdist(X1, X2, length_scales):
    """
    Pairwise squared distances of X1 (n,d) vs X2 (m,d) in units of the
    length scales, via direct differences (VPU): exact in any dtype, unlike
    the ||a||^2+||b||^2-2ab matmul expansion whose cancellation error is
    catastrophic in float32.  At this workload's d (<= ~20) the MXU would be
    >90% padding anyway, so the elementwise form is also the fast one; XLA
    fuses the (n,m,d) intermediate into the reduction.
    """
    A = X1 / length_scales
    B = X2 / length_scales
    # Statically unrolled over d with 2-D ops only: a single (n, m, d)
    # broadcast takes minutes to *lower* on the axon TPU backend, while the
    # unrolled 2-D form lowers in milliseconds (same flops either way).
    d = X1.shape[-1]
    sq = None
    for k in range(d):
        dk = A[..., k][..., :, None] - B[..., k][..., None, :]
        sq = dk * dk if sq is None else sq + dk * dk
    return sq


def _safe_sqrt(s):
    """sqrt with a zero-safe gradient at s = 0 (Matern kernels)."""
    safe = jnp.where(s > 0.0, s, 1.0)
    return jnp.where(s > 0.0, jnp.sqrt(safe), 0.0)


@partial(jax.jit, static_argnames=("family",))
def cross_kernel(family, theta, X1, X2):
    """
    Covariance matrix K(X1, X2) of shape (n, m).

    ``family`` is static; theta as in the module docstring.
    """
    variance = jnp.exp(theta[0])
    ls = jnp.exp(theta[1:])
    sq = _scaled_sqdist(X1, X2, ls)
    if family == "rbf":
        k = jnp.exp(-0.5 * sq)
    elif family == "matern12":
        r = _safe_sqrt(sq)
        k = jnp.exp(-r)
    elif family == "matern32":
        r = _safe_sqrt(3.0 * sq)
        k = (1.0 + r) * jnp.exp(-r)
    elif family == "matern52":
        r = _safe_sqrt(5.0 * sq)
        k = (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    else:
        raise ValueError(f"Unknown kernel family '{family}'.")
    return variance * k


def kernel_diag(theta, X):
    """diag K(X, X) — constant, equal to the output variance."""
    return jnp.full(X.shape[:-1], jnp.exp(theta[0]), dtype=X.dtype)


def theta_bounds_dynamic(theta, d, prior_widths=None, dynamic=False,
                         output_scale_prior=(1e-2, 1e3),
                         length_scale_prior=(1e-3, 1e1)):
    """
    Log-space optimization bounds for theta, matching the reference's bound
    policy (gpry/kernels.py:157-191, gpry/gpr.py:328-363):

    * the constant kernel keeps static bounds ``output_scale_prior**2``
      (it parametrizes the variance);
    * with ``dynamic=False`` (the reference's default auto-built kernel),
      each length scale gets the static ``length_scale_prior`` bounds (in
      preprocessed coordinates);
    * with ``dynamic=True``, each length scale gets
      ``[w * 1e-3, w * 100]`` where ``w`` is that dimension's prior width
      (``max_length``), or the current value if no width is known.

    Returns an array of shape (1 + d, 2) of *log-space* bounds.
    """
    import numpy as np

    theta = np.asarray(theta)
    bounds = [[np.log(output_scale_prior[0] ** 2),
               np.log(output_scale_prior[1] ** 2)]]
    for i in range(d):
        if dynamic:
            if prior_widths is not None:
                ref = float(prior_widths[i])
            else:
                ref = float(np.exp(theta[1 + i]))
            bounds.append([np.log(ref * 1e-3), np.log(ref * 100.0)])
        else:
            bounds.append([np.log(length_scale_prior[0]),
                           np.log(length_scale_prior[1])])
    return np.array(bounds)
