"""
Pallas fused prediction kernel: golden-value test against the XLA path
(interpret mode on CPU; the same kernel runs compiled on TPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_fused_predict_mean_matches_xla(interpret_pallas, rng):
    import importlib
    import gpry_tpu.ops.pallas_kernels as pk
    importlib.reload(pk)  # re-bind pl.pallas_call after the patch
    from gpry_tpu.ops.kernels import cross_kernel, make_theta

    d, nmax, nq = 5, 256, 300   # nq deliberately not a tile multiple
    X = jnp.asarray(rng.uniform(size=(nmax, d)), jnp.float32)
    alpha = jnp.asarray(rng.normal(size=nmax), jnp.float32)
    # padded rows with zero alpha must not contribute
    alpha = alpha.at[200:].set(0.0)
    Xq = jnp.asarray(rng.uniform(size=(nq, d)), jnp.float32)
    theta = jnp.asarray(make_theta(1.5, [0.3] * d), jnp.float32)

    mean_pl = pk.fused_predict_mean_f32(theta, X, alpha, Xq)
    mean_ref = cross_kernel("rbf", theta, Xq, X) @ alpha
    assert mean_pl.shape == (nq,)
    assert np.allclose(np.asarray(mean_pl), np.asarray(mean_ref),
                       atol=1e-5)
