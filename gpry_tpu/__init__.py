"""
gpry_tpu — TPU-native active-learning Bayesian inference of expensive
likelihoods (a from-scratch JAX/XLA/Pallas rebuild of the capabilities of
GPry, jonaselgammal/GPry v3.0.0).
"""

__version__ = "0.1.0"

# Importing config first sets the x64 flag before any jax.numpy use.
from gpry_tpu import config  # noqa: F401
