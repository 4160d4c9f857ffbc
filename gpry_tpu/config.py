"""
Global numerical configuration for gpry_tpu.

Precision policy
----------------
GP surrogate modelling of log-posteriors is numerically delicate: the kernel
matrix can reach condition numbers ~1e6-1e8 even with the reference's default
diagonal noise (``noise_level=1e-2`` on standardized y, cf. reference
``gpry/gpr.py:265``).  float32 Cholesky loses most significant digits there,
so the *factorization/fit* path defaults to float64.  On TPU, float64 is
emulated but the kernel matrices of this workload are tiny
(N <= max_total = 70 d^1.5, i.e. ~1.6k x 1.6k at d=8), so the emulation cost
is negligible next to the batched prediction sweeps, which are
matmul-dominated and can run in float32/bfloat16 on the MXU.

``gpry_tpu`` therefore enables ``jax_enable_x64`` at import time (disable by
setting the environment variable ``GPRY_TPU_X64=0`` *before* importing) and
exposes per-component dtype knobs.
"""

import os

import jax

_X64 = os.environ.get("GPRY_TPU_X64", "1") not in ("0", "false", "False")
if _X64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (OPT-IN via GPRY_TPU_COMP_CACHE=1): caching
# helps the minutes-long TPU compiles, but on this infrastructure the cache
# has served CPU AOT executables compiled with mismatched machine features
# ("+prefer-no-gather ... could lead to SIGILL"), silently corrupting
# results — so it stays off unless explicitly requested.
if os.environ.get("GPRY_TPU_COMP_CACHE", "0") in ("1", "true"):
    _cache_dir = os.environ.get(
        "GPRY_TPU_COMP_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpry_tpu_xla"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is best-effort
        pass

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: dtype used for GP state, Cholesky factorization and LML optimization.
FIT_DTYPE = jnp.float64 if _X64 else jnp.float32

#: Dtype policy for large batched prediction sweeps (acquisition ranking,
#: NS, ranked-pool conditioning): "auto" (default), "float32", or
#: "float64"/"fit".  GP interpolants of log-posteriors are intrinsically
#: ill-conditioned: the float32 sweep error is ~eps32 * k_max * sum|alpha|
#: * y_scale raw nats (measured: 0.3-3.6 nats on representative problems —
#: enough to break acquisition and convergence).  "auto" therefore runs
#: sweeps in the fit dtype unless that per-factorization error bound is
#: below SWEEP_F32_TOL (and only downgrades on accelerators — f32 buys
#: nothing on CPU).  Override via GPRY_TPU_SWEEP_DTYPE.
SWEEP_DTYPE = os.environ.get("GPRY_TPU_SWEEP_DTYPE", "auto")
#: max acceptable estimated float32 sweep error, in raw log-posterior nats
SWEEP_F32_TOL = float(os.environ.get("GPRY_TPU_SWEEP_F32_TOL", "0.05"))

#: Importance-corrected float32 NS proposals: when the sweep dtype is
#: float64 (f32 deemed unsafe for *scoring*), the nested-sampling loop can
#: still run float32 — it only *proposes* sample locations — with the
#: final sample re-scored by ONE batched float64 sweep and the density
#: difference folded into the weights (the same reweighting mechanism the
#: engine already uses to reuse samples across GP updates, reference
#: gpry/gp_acquisition.py:875-919).  "1" (default): on accelerators;
#: "0": off (NS runs in the sweep dtype); "force": everywhere (tests).
NS_PROPOSAL_F32 = os.environ.get("GPRY_TPU_NS_PROPOSAL_F32", "1")
#: max estimated f32 sweep error (raw nats) for which the f32-proposal NS
#: is still used: beyond this the f32 surface is distorted enough that the
#: proposal misplaces its mass and the importance correction collapses the
#: effective sample size (measured: est ~3 nats -> biased moments even
#: after correction; est ~0.4 -> indistinguishable from f64).
NS_PROPOSAL_F32_TOL = float(os.environ.get("GPRY_TPU_NS_PROPOSAL_F32_TOL",
                                           "1.0"))


def x64_enabled():
    """Whether the package runs in float64 mode."""
    return _X64


# ---------------------------------------------------------------------------
# Padded-buffer bucketing
# ---------------------------------------------------------------------------
# The training set grows every iteration.  To keep every jitted function
# compiled once per *bucket* instead of once per size, padded buffer sizes
# are rounded up to the next bucket boundary.  Buckets are multiples of 64
# that grow geometrically (x1.5), aligned with TPU lane tiling (128) once
# large enough.

_MIN_BUCKET = 64


def bucket_size(n: int) -> int:
    """Smallest padded buffer size >= ``n`` from the bucket ladder."""
    b = _MIN_BUCKET
    while b < n:
        # grow by 1.5x, rounded up to a multiple of 64
        b = ((int(b * 1.5) + 63) // 64) * 64
    return b
