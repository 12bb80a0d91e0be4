"""Prediction + uncertainty + embedding extraction
(reference: src/training/predictor.py:18-596, src/training/extractors.py).

All predictors are jit-compiled pure functions over padded batches.  The
reference extracts embeddings with forward hooks; here the model returns
its intermediates (GNNOutput.atom_embeddings / mol_embeddings), so
extraction is just asking for them.

MC-dropout matches the reference semantics (model in eval mode but dropout
active; reference predictor.py:93-180): S stochastic passes with distinct
dropout keys → mean/std.  Evidential uncertainty decomposes into aleatoric
β/(α−1) and epistemic β/(ν(α−1)) (reference predictor.py:287-360).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gnn import GNN
from ..models.losses import evidential_params


def _gather_valid(arrs, masks):
    out = [a[m] for a, m in zip(arrs, masks)]
    return np.concatenate(out) if out else np.zeros((0,))


def predict(
    model: GNN,
    params,
    loader,
    pipeline=None,
    return_embeddings: bool = False,
) -> Dict[str, np.ndarray]:
    """Deterministic prediction over a loader, inverse-transformed."""
    from .evaluator import forward_fn

    # only compile/transfer the intermediates when they're requested
    fwd = forward_fn(model, "full" if return_embeddings else "predictions")
    preds, mols, atoms, atom_mols = [], [], [], []
    for batch in loader:
        out = fwd(params, batch)
        gm = np.asarray(batch.graph_mask)
        pred_arr = out.predictions if return_embeddings else out
        preds.append(np.asarray(pred_arr)[gm])
        if return_embeddings:
            am = np.asarray(batch.atom_mask)
            mols.append(np.asarray(out.mol_embeddings)[gm])
            atoms.append(np.asarray(out.atom_embeddings)[am])
            # remap graph slot ids to dense global molecule order (binned
            # layouts intersperse padding slots, so rank via graph_mask)
            local = _dense_mol_rank(gm, np.asarray(batch.atom_mol)[am])
            offset = sum(int(x.shape[0]) for x in mols[:-1])
            atom_mols.append(local + offset)
    result: Dict[str, np.ndarray] = {"predictions": np.concatenate(preds)}
    if pipeline is not None:
        result["predictions"] = _inverse(result["predictions"], pipeline)
    if return_embeddings:
        result["mol_embeddings"] = np.concatenate(mols)
        result["atom_embeddings"] = np.concatenate(atoms)
        result["atom_mol_index"] = np.concatenate(atom_mols)
    return result


def _inverse(preds: np.ndarray, pipeline) -> np.ndarray:
    if pipeline is None:
        return preds
    scaler = pipeline.standard_scaler
    if scaler is not None and scaler.is_fitted:
        T = scaler.stds.shape[0]
        if preds.shape[1] == 4 * T:
            # evidential raw outputs: inverse-transform the γ head only,
            # leave ν/α/β raw
            out = preds.reshape(len(preds), T, 4).copy()
            out[:, :, 0] = scaler.inverse_transform(out[:, :, 0])
            return out.reshape(len(preds), 4 * T)
    return pipeline.inverse_transform(preds)


def predict_mc_dropout(
    model: GNN,
    params,
    loader,
    num_samples: int,
    rng: Optional[jax.Array] = None,
    pipeline=None,
) -> Dict[str, np.ndarray]:
    """MC-dropout: S stochastic passes → mean / std
    (reference: src/training/predictor.py:93-180)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    from .evaluator import forward_fn

    fwd_stoch = forward_fn(model, "stochastic")

    all_means, all_stds = [], []
    for batch in loader:
        gm = np.asarray(batch.graph_mask)
        samples = []
        for s in range(num_samples):
            key = jax.random.fold_in(rng, s)
            samples.append(np.asarray(fwd_stoch(params, batch, key))[gm])
        stack = np.stack(samples)  # (S, B, T)
        all_means.append(stack.mean(axis=0))
        all_stds.append(stack.std(axis=0))
    mean = np.concatenate(all_means)
    std = np.concatenate(all_stds)
    if pipeline is not None and pipeline.standard_scaler is not None:
        mean = pipeline.inverse_transform(mean)
        std = std * pipeline.standard_scaler.stds  # scale-only for spread
    return {"predictions": mean, "uncertainty": std}


def predict_evidential(
    model: GNN,
    params,
    loader,
    num_tasks: int,
    pipeline=None,
) -> Dict[str, np.ndarray]:
    """Evidential prediction with aleatoric/epistemic decomposition
    (reference: src/training/predictor.py:287-360)."""
    from .evaluator import forward_fn

    fwd = forward_fn(model, "predictions")
    gammas, aleas, epis = [], [], []
    for batch in loader:
        raw = fwd(params, batch)
        gamma, nu, alpha, beta = evidential_params(raw, num_tasks)
        gm = np.asarray(batch.graph_mask)
        gammas.append(np.asarray(gamma)[gm])
        aleas.append(np.asarray(beta / (alpha - 1.0))[gm])
        epis.append(np.asarray(beta / (nu * (alpha - 1.0)))[gm])
    gamma = np.concatenate(gammas)
    alea = np.concatenate(aleas)
    epi = np.concatenate(epis)
    if pipeline is not None and pipeline.standard_scaler is not None:
        gamma = pipeline.inverse_transform(gamma)
        scale2 = pipeline.standard_scaler.stds.astype(np.float64) ** 2
        alea = alea * scale2
        epi = epi * scale2
    return {
        "predictions": gamma,
        "aleatoric_uncertainty": alea,
        "epistemic_uncertainty": epi,
        "total_uncertainty": alea + epi,
    }


def extract_partial_charges(
    model: GNN, params, loader
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-atom partial charges grouped by molecule index.

    The reference defines this but never wires it to any pipeline (quirk
    Q9; reference src/training/extractors.py:16); here it is a first-class
    API used by the CLI's --output_partial_charges."""
    from .evaluator import forward_fn

    fwd = forward_fn(model, "full")
    charges, mol_idx = [], []
    offset = 0
    for batch in loader:
        out = fwd(params, batch)
        if out.partial_charges is None:
            raise ValueError("Model was not built with use_partial_charges=True")
        am = np.asarray(batch.atom_mask)
        gm = np.asarray(batch.graph_mask)
        charges.append(np.asarray(out.partial_charges)[am])
        mol_idx.append(_dense_mol_rank(gm, np.asarray(batch.atom_mol)[am]) + offset)
        offset += int(gm.sum())
    return np.concatenate(charges), np.concatenate(mol_idx)


def _dense_mol_rank(graph_mask: np.ndarray, slot_ids: np.ndarray) -> np.ndarray:
    """Map graph-slot ids of real atoms to 0..n_real-1 rank.  Identity for
    flat layouts; collapses the interspersed padding slots of binned
    layouts (data/binning.py)."""
    real = np.flatnonzero(graph_mask)
    return np.searchsorted(real, slot_ids).astype(np.int64)
