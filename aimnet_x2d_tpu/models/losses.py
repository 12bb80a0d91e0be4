"""Loss functions (reference: src/models/losses.py:14-279).

All losses are pure functions ``loss(preds, targets, graph_mask) -> scalar``
operating on padded (B, ·) arrays; ``graph_mask`` marks real graphs so that
padding rows contribute nothing and means are taken over real rows only.

Semantics parity notes:
- unweighted l1/mse reduce with a mean over ALL elements (torch
  nn.L1Loss/nn.MSELoss), while the weighted variants sum over tasks then
  mean over the batch — these differ by a factor of num_tasks and we keep
  both behaviors.
- evidential: NIG negative log-likelihood with softplus(+1) constraints and
  regularizer λ(2β+α); the unweighted form means over all (B, T) elements,
  the weighted form sums tasks then means over batch.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    # x: (B,) or (B, T); mask: (B,)
    if x.ndim == 2:
        total = jnp.sum(x * mask[:, None])
        count = jnp.sum(mask) * x.shape[1]
    else:
        total = jnp.sum(x * mask)
        count = jnp.sum(mask)
    return total / jnp.maximum(count, 1.0)


def l1_loss(preds, targets, graph_mask):
    return _masked_mean(jnp.abs(preds - targets), graph_mask.astype(preds.dtype))


def mse_loss(preds, targets, graph_mask):
    return _masked_mean((preds - targets) ** 2, graph_mask.astype(preds.dtype))


def weighted_l1_loss(weights):
    w = jnp.asarray(weights, jnp.float32)

    def loss(preds, targets, graph_mask):
        err = jnp.abs(preds - targets) * w
        per_sample = err.sum(axis=1)
        return _masked_mean(per_sample, graph_mask.astype(preds.dtype))

    return loss


def weighted_mse_loss(weights):
    w = jnp.asarray(weights, jnp.float32)

    def loss(preds, targets, graph_mask):
        err = ((preds - targets) ** 2) * w
        per_sample = err.sum(axis=1)
        return _masked_mean(per_sample, graph_mask.astype(preds.dtype))

    return loss


def evidential_params(outputs, num_tasks):
    """Split raw (B, 4T) outputs into constrained NIG params (γ, ν, α, β).

    Matches reference constraint application: ν = softplus(ν)+1,
    α = softplus(α)+1, β = softplus(β) (src/models/losses.py:139-142).
    """
    B = outputs.shape[0]
    o = outputs.reshape(B, num_tasks, 4)
    gamma = o[:, :, 0]
    nu = jax.nn.softplus(o[:, :, 1]) + 1.0
    alpha = jax.nn.softplus(o[:, :, 2]) + 1.0
    beta = jax.nn.softplus(o[:, :, 3])
    return gamma, nu, alpha, beta


def _evidential_elementwise(outputs, targets, lambda_reg):
    T = targets.shape[1]
    gamma, nu, alpha, beta = evidential_params(outputs, T)
    diff = targets - gamma
    nll = (
        0.5 * jnp.log(jnp.pi / nu)
        - alpha * jnp.log(2.0 * beta)
        + jax.lax.lgamma(alpha)
        - jax.lax.lgamma(alpha + 0.5)
        + (alpha + 0.5) * jnp.log(beta + nu * diff**2 / 2.0)
    )
    reg = lambda_reg * (2.0 * beta + alpha)
    return nll + reg


def evidential_loss(lambda_reg: float = 1.0):
    def loss(preds, targets, graph_mask):
        elem = _evidential_elementwise(preds, targets, lambda_reg)
        return _masked_mean(elem, graph_mask.astype(elem.dtype))

    return loss


def weighted_evidential_loss(weights, lambda_reg: float = 1.0):
    w = jnp.asarray(weights, jnp.float32)

    def loss(preds, targets, graph_mask):
        elem = _evidential_elementwise(preds, targets, lambda_reg) * w
        per_sample = elem.sum(axis=1)
        return _masked_mean(per_sample, graph_mask.astype(elem.dtype))

    return loss


def create_loss_function(
    loss_type: str,
    task_type: str = "regression",
    multitask_weights: Optional[Sequence[float]] = None,
    lambda_reg: float = 1.0,
) -> Callable:
    """Factory mirroring reference create_loss_function
    (src/models/losses.py:239-279)."""
    if loss_type == "l1":
        if task_type == "multitask" and multitask_weights is not None:
            return weighted_l1_loss(multitask_weights)
        return l1_loss
    if loss_type == "mse":
        if task_type == "multitask" and multitask_weights is not None:
            return weighted_mse_loss(multitask_weights)
        return mse_loss
    if loss_type == "evidential":
        if task_type == "multitask" and multitask_weights is not None:
            return weighted_evidential_loss(multitask_weights, lambda_reg)
        return evidential_loss(lambda_reg)
    raise ValueError(
        f"Unsupported loss type: {loss_type}. Supported: ['l1', 'mse', 'evidential']"
    )
