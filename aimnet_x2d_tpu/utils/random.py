"""Seeding utilities (reference: src/utils/random.py:10-25).

JAX is functionally seeded (explicit PRNG keys), so unlike the torch
reference there is no global device RNG to pin; we seed python/numpy for the
host-side pipeline and return a root jax PRNG key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
