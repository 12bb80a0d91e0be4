"""Activation factory (reference: src/utils/activation.py:9-35).

Notes on parity with torch:
- ``gelu`` uses the exact (erf) formulation, matching torch.nn.GELU default.
- ``leakyrelu`` uses negative_slope 0.01, the torch default.
- default activation is silu, as in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


_ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "leakyrelu": _leaky_relu,
    "elu": jax.nn.elu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "silu": jax.nn.silu,
}


def get_activation_function(name: str = "silu") -> Callable:
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise ValueError(
            f"Unsupported activation: {name}. Supported: {sorted(_ACTIVATIONS)}"
        ) from None
