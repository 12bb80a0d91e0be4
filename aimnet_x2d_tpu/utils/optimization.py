"""Parameter freezing and counting utilities
(reference: src/utils/optimization.py:9-148).

Freezing in JAX is a gradient mask: ``freeze_mask`` marks leaves whose path
matches any substring pattern; the trainer multiplies updates by the mask
(equivalent to requires_grad=False).  Layer-wise LR decay by name depth
lives in training/trainer.py:make_optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import numpy as np


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def freeze_mask(params, patterns: Sequence[str], freeze: bool = True):
    """Pytree of 0/1 floats: 0 for leaves whose path contains any pattern
    (if freeze) or 1 only for matching leaves (if not freeze = unfreeze-only
    mode, matching the reference's freeze/unfreeze pair)."""

    def leaf_mask(path, x):
        hit = any(p in _path_str(path) for p in patterns)
        keep = (not hit) if freeze else hit
        return np.float32(1.0 if keep else 0.0)

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def apply_mask(updates, mask):
    return jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)


def count_parameters(params, mask=None) -> Dict[str, int]:
    """Total vs trainable parameter counts (reference:
    src/utils/optimization.py:126-148 distinguishes them via
    requires_grad).  ``mask`` is a :func:`freeze_mask` pytree; frozen
    leaves (mask 0) count as non-trainable.  Without a mask everything is
    trainable."""
    leaves = jax.tree_util.tree_leaves(params)
    total = int(sum(np.size(x) for x in leaves))
    if mask is None:
        trainable = total
    else:
        trainable = int(
            sum(
                np.size(x) if float(m) else 0
                for x, m in zip(
                    leaves, jax.tree_util.tree_leaves(mask), strict=True
                )
            )
        )
    return {"total_parameters": total, "trainable_parameters": trainable}
