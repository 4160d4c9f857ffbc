"""
Random-number-generator plumbing.

The reference spawns per-MPI-rank generators from a SeedSequence
(gpry/mpi.py:31-50).  Single-controller equivalent: one numpy Generator for
host-side decisions plus jax PRNG keys (derived from it) for device
programs.
"""

import numpy as np


def get_random_generator(seed=None):
    """Build the host Generator (reference: gpry/mpi.py:31)."""
    if isinstance(seed, np.random.Generator):
        return seed
    return np.random.default_rng(seed)


def jax_key_from_rng(rng):
    """Derive a jax PRNG key from the host generator."""
    import jax
    return jax.random.PRNGKey(int(rng.integers(2**31)))
