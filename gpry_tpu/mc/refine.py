"""
Importance-sampling refinement of a surrogate MC sample.

Why (beyond the reference): on multimodal surrogates the mode WEIGHTS of
a nested-sampling (or MCMC) sample carry large estimator noise — measured
on Himmelblau round 4: the trained surrogate's posterior moments are
exact to momKL ~1e-7 (grid quadrature) while the final device-NS sample
reports momKL 0.16-0.51, i.e. the entire headline error was the final
sampler, not the model.  The reference inherits whatever its external
sampler produces (gpry/mc.py:173-455) and has no equivalent.

The refinement is the TPU-native estimator: fit a Gaussian-mixture
proposal to the existing sample's detected modes (host-side MST
clustering, utils/modes.py), draw a large batch (default 2^16), score the
surrogate in ONE batched device predict — an embarrassingly parallel
MXU-friendly workload — and self-normalize the importance weights
p(x)/q(x).  The proposal is truncated to the prior box by rejection;
truncation only rescales q by a constant, which cancels in
self-normalized weights.  A defensive uniform mixture component bounds
the weight variance wherever the mixture underfits.

The refined sample replaces the input only when its effective sample
size clearly beats the input's (both measured by 1/sum(w_norm^2)), so a
bad proposal can never make the result worse.
"""

import numpy as np

import jax.numpy as jnp


def _mixture_logpdf(X, means, covs, log_wmix, lo, hi, log_eps):
    """log q(x) of the mode mixture + eps * Uniform(box), up to the
    (constant) box-truncation normalization."""
    from scipy.stats import multivariate_normal
    parts = [log_eps - np.sum(np.log(hi - lo))
             + np.zeros(len(X))]  # uniform component
    for m, C, lw in zip(means, covs, log_wmix):
        parts.append(lw + multivariate_normal.logpdf(
            X, mean=m, cov=C, allow_singular=True))
    P = np.stack(parts, axis=0)
    mx = P.max(axis=0)
    return mx + np.log(np.exp(P - mx).sum(axis=0))


def ess(weights):
    """Kish effective sample size of (unnormalized) weights."""
    w = np.asarray(weights, dtype=float)
    w = np.where(np.isfinite(w) & (w > 0), w, 0.0)
    s = w.sum()
    if s <= 0:
        return 0.0
    wn = w / s
    return float(1.0 / np.sum(wn ** 2))


def is_refine_sample(gpr, sample, bounds, rng=None, n_draw=65536,
                     eps_uniform=0.05, inflate=1.5, min_gain=2.0,
                     verbose=1):
    """
    Refine ``sample`` ({"X", "weights", ...}) by mixture importance
    sampling against the surrogate.  Returns a NEW samples dict (with
    ``"refined": True``) when the refinement's ESS beats the input's by
    ``min_gain``x, else the input sample unchanged.
    """
    from gpry_tpu.models.gp import surrogate_predict_mean
    from gpry_tpu.utils.modes import detect_modes
    rng = rng if isinstance(rng, np.random.Generator) \
        else np.random.default_rng(rng)
    X_in = np.asarray(sample["X"], dtype=float)
    w_in = np.asarray(sample["weights"], dtype=float)
    if len(X_in) < 8:
        return sample
    bounds = np.asarray(bounds, dtype=float)
    lo, hi = bounds[:, 0], bounds[:, 1]
    d = bounds.shape[0]
    try:
        modes = detect_modes(X_in, w_in, n_resample=2048, rng=rng)
    except Exception:
        return sample
    if not modes:
        return sample
    means = [c["mean"] for c in modes]
    covs = [c["cov"] * inflate ** 2 for c in modes]
    wmix = np.array([c["weight"] for c in modes]) * (1.0 - eps_uniform)
    log_wmix = np.log(wmix)
    log_eps = np.log(eps_uniform)
    # --- draw from the truncated mixture by rejection --------------------
    X = np.empty((0, d))
    n_uni = 0
    for _ in range(4):  # the mixture sits inside the box: few retries
        need = n_draw - len(X)
        if need <= 0:
            break
        comp = rng.choice(len(modes) + 1, size=need,
                          p=np.append(wmix, eps_uniform))
        draws = np.empty((need, d))
        uni = comp == len(modes)
        n_uni += int(uni.sum())
        draws[uni] = lo + rng.random((int(uni.sum()), d)) * (hi - lo)
        for k in range(len(modes)):
            selk = comp == k
            if not np.any(selk):
                continue
            draws[selk] = rng.multivariate_normal(
                means[k], covs[k], size=int(selk.sum()),
                check_valid="ignore")
        inside = np.all((draws >= lo) & (draws <= hi), axis=1)
        X = np.concatenate([X, draws[inside]], axis=0)
    if len(X) < max(1024, 16 * d):
        return sample  # mixture leaks out of the box: refuse
    # --- one batched device predict (the hot op) --------------------------
    p = gpr.sweep_params()
    logp = np.asarray(surrogate_predict_mean(
        gpr.family, p, jnp.asarray(X, p.X.dtype)), dtype=float)
    gpr.n_eval += len(X)
    logq = _mixture_logpdf(X, means, covs, log_wmix, lo, hi, log_eps)
    logw = logp - logq
    logw = np.where(np.isfinite(logw), logw, -np.inf)
    mx = logw.max()
    if not np.isfinite(mx):
        return sample
    w = np.exp(logw - mx)
    ess_new, ess_old = ess(w), ess(w_in)
    if ess_new < min_gain * ess_old:
        if verbose >= 2:
            print(f"[IS-REFINE] kept input sample: refined ESS "
                  f"{ess_new:.0f} < {min_gain}x input ESS {ess_old:.0f}")
        return sample
    out = dict(sample)
    out.update({
        "X": X, "logpost": logp, "weights": w,
        "refined": True, "ess": ess_new, "ess_input": ess_old,
        "n_calls": int(sample.get("n_calls", 0)) + len(X),
    })
    if verbose >= 2:
        print(f"[IS-REFINE] refined: ESS {ess_old:.0f} -> {ess_new:.0f} "
              f"({len(modes)} proposal modes, {len(X)} draws)")
    return out
