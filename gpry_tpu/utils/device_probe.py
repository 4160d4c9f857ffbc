"""
Accelerator liveness probe.

The TPU here sits behind a shared tunnel; an outage can leave device
LISTING healthy while every computation hangs forever (observed live
during long runs).  The only reliable health check is executing real
compute in a SUBPROCESS with a hard timeout — an in-process probe would
block the caller just like the workload does.

Used by ``bench.py`` and ``benchmarks/d16.py`` so benchmarks launched
during an outage wait it out (bounded) instead of hanging.
"""

import subprocess
import sys
import time

_PROBE_SRC = ("import jax, jax.numpy as jnp; x = jnp.ones((64, 64)); "
              "print(float((x @ x).sum()))")


def wait_for_device_compute(max_wait_s=1800, probe_timeout_s=90,
                            poll_s=60, log_prefix="#", log=None):
    """
    Block until the default jax backend actually executes a matmul,
    re-probing every ``poll_s`` seconds.  Returns True when compute
    succeeds, False once ``max_wait_s`` elapses without success.
    """
    if log is None:
        def log(msg):
            print(msg, file=sys.stderr, flush=True)
    t0 = time.time()
    while True:
        try:
            proc = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                                  capture_output=True, text=True,
                                  timeout=probe_timeout_s)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 >= max_wait_s:
            return False
        log(f"{log_prefix} device compute probe failed; tunnel down. "
            f"Re-probing in {poll_s}s.")
        time.sleep(poll_s)
