"""Evaluation: batched forward + loss + regression metrics
(reference: src/training/evaluator.py:20-365).

Metrics (MAE / RMSE / R²) are computed after inverse-transforming both
predictions and targets through the preprocessing pipeline, overall and
per-task for multitask — matching the reference's sklearn computation on
inverse-scaled arrays.  For evidential models the γ (mean) head is used.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import MolBatch
from ..models.gnn import GNN
from ..models.losses import create_loss_function


def compute_metrics(
    preds: np.ndarray, targets: np.ndarray, per_task: bool = True
) -> Dict[str, Any]:
    """MAE / RMSE / R² with sklearn conventions (R² of constant targets → 0
    handled as in sklearn: returns 0.0 when variance is 0)."""
    preds = np.asarray(preds, np.float64)
    targets = np.asarray(targets, np.float64)
    err = preds - targets

    def r2(p, t):
        ss_res = np.sum((t - p) ** 2)
        ss_tot = np.sum((t - t.mean(axis=0)) ** 2)
        return float(1.0 - ss_res / ss_tot) if ss_tot > 0 else 0.0

    out: Dict[str, Any] = {
        "mae": float(np.mean(np.abs(err))),
        "rmse": float(np.sqrt(np.mean(err**2))),
        "r2": r2(preds, targets),
    }
    if per_task and preds.ndim == 2 and preds.shape[1] > 1:
        out["per_task"] = {
            "mae": [float(np.mean(np.abs(err[:, t]))) for t in range(preds.shape[1])],
            "rmse": [float(np.sqrt(np.mean(err[:, t] ** 2))) for t in range(preds.shape[1])],
            "r2": [r2(preds[:, t], targets[:, t]) for t in range(preds.shape[1])],
        }
    return out


# Jitted-forward cache keyed by model *config* (GNNConfig is a frozen,
# hashable dataclass): equal-config models share one trace/executable, so
# long multi-trial runs (hyperopt) don't accumulate compilations, and the
# cache stays bounded by the number of distinct architectures.
_FORWARD_CACHE: Dict[Any, Any] = {}
_FORWARD_CACHE_MAX = 32


def forward_fn(model: GNN, variant: str = "predictions"):
    key = (type(model).__name__, model.config, variant)
    if key not in _FORWARD_CACHE:
        if len(_FORWARD_CACHE) >= _FORWARD_CACHE_MAX:
            _FORWARD_CACHE.pop(next(iter(_FORWARD_CACHE)))
        if variant == "predictions":
            fn = jax.jit(lambda p, b: model.apply(p, b, deterministic=True).predictions)
        elif variant == "full":
            fn = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
        elif variant == "stochastic":
            fn = jax.jit(
                lambda p, b, key: model.apply(
                    p, b, deterministic=False, rngs={"dropout": key}
                ).predictions
            )
        else:
            raise ValueError(variant)
        _FORWARD_CACHE[key] = fn
    return _FORWARD_CACHE[key]


def _forward_fn(model: GNN):
    return forward_fn(model, "predictions")


def predict_batches(model: GNN, params, loader, *, mesh=None):
    """Run the model over a loader, returning unpadded (preds, targets)."""
    fwd = _forward_fn(model)
    preds_list, tgt_list = [], []
    for batch in loader:
        stacked = batch.atom_type.ndim == 2  # (n_dev, A) stacked loader
        preds = fwd(params, batch) if not stacked else jax.vmap(
            lambda b: fwd(params, b)
        )(batch)
        preds = np.asarray(preds)
        if stacked:
            mask = np.asarray(batch.graph_mask).reshape(-1)
            preds = preds.reshape(-1, preds.shape[-1])
            targets = np.asarray(batch.targets).reshape(-1, batch.targets.shape[-1])
        else:
            mask = np.asarray(batch.graph_mask)
            targets = np.asarray(batch.targets)
        preds_list.append(preds[mask])
        tgt_list.append(targets[mask])
    return np.concatenate(preds_list), np.concatenate(tgt_list)


def evaluate(
    model: GNN,
    params,
    loader,
    *,
    config=None,
    loss_fn=None,
    pipeline=None,
    mesh=None,
) -> Dict[str, Any]:
    """Loss (on preprocessed scale) + metrics (on inverse-transformed scale)."""
    if loss_fn is None:
        assert config is not None
        loss_fn = create_loss_function(
            config.loss_function,
            config.task_type,
            config.multitask_weights,
            lambda_reg=getattr(config, "evidential_lambda", 1.0),
        )

    preds, targets = predict_batches(model, params, loader, mesh=mesh)
    mask = np.ones(len(preds), bool)
    loss = float(
        loss_fn(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask))
    )

    # Evidential models: metrics on the γ head
    # (reference: src/training/evaluator.py:84-101)
    T = targets.shape[1]
    if preds.shape[1] == 4 * T:
        preds_mean = preds.reshape(len(preds), T, 4)[:, :, 0]
    else:
        preds_mean = preds

    if pipeline is not None:
        preds_mean = pipeline.inverse_transform(preds_mean)
        targets = pipeline.inverse_transform(targets)

    metrics = compute_metrics(preds_mean, targets)
    metrics["loss"] = loss
    return metrics
