"""Artifact save/load round-trip, transfer learning, freeze masks,
predictors (MC-dropout, evidential, embeddings, partial charges)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.checkpoint import (
    load_artifact,
    save_artifact,
    transfer_params,
)
from aimnet_x2d_tpu.data import PreprocessingConfig, PreprocessingPipeline
from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
from aimnet_x2d_tpu.models import GNN, GNNConfig
from aimnet_x2d_tpu.training.predictor import (
    extract_partial_charges,
    predict,
    predict_evidential,
    predict_mc_dropout,
)
from aimnet_x2d_tpu.utils.optimization import count_parameters, freeze_mask

CFG = GNNConfig(
    hidden_dim=32, output_dim=2, num_shells=2, num_message_passing_layers=2,
    embedding_dim=8, ffn_num_layers=2, task_type="multitask",
)


def _params_and_batch(cfg=CFG, seed=0):
    batch = make_synthetic_batch(num_graphs=6, mean_atoms=10, num_hops=2, num_tasks=2, seed=seed)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(seed), batch)
    return model, params, batch


def _loader_from_batches(batches):
    class L:
        def __iter__(self):
            return iter(batches)

    return L()


def test_artifact_roundtrip(tmp_path):
    model, params, batch = _params_and_batch()
    rng = np.random.default_rng(0)
    pipe = PreprocessingPipeline(PreprocessingConfig())
    pipe.fit([np.array([6, 1])] * 10, rng.normal(size=(10, 2)))

    path = str(tmp_path / "model.npz")
    save_artifact(path, params, CFG, pipe, extra={"epochs": 3})
    art = load_artifact(path)

    assert art.model_config == CFG
    assert art.extra["epochs"] == 3
    # identical predictions from restored params
    out1 = model.apply(params, batch).predictions
    out2 = GNN(art.model_config).apply(art.params, batch).predictions
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
    # preprocessing restored
    x = rng.normal(size=(4, 2)).astype(np.float32)
    np.testing.assert_allclose(
        pipe.inverse_transform(x), art.pipeline.inverse_transform(x), rtol=1e-6
    )


def test_transfer_params_partial():
    _, params_a, _ = _params_and_batch(seed=0)
    cfg_b = dataclasses.replace(CFG, output_dim=5)  # different head
    model_b, params_b, _ = _params_and_batch(cfg_b, seed=1)
    merged, copied, skipped = transfer_params(params_a, params_b, verbose=False)
    assert copied > 0 and skipped > 0  # head layer shape differs → kept fresh
    # embedding table must equal source
    a = params_a["params"]["atom_type_embedding"]
    m = merged["params"]["atom_type_embedding"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(m))


def test_freeze_mask():
    _, params, _ = _params_and_batch()
    mask = freeze_mask(params, ["embedding"], freeze=True)
    leaves = jax.tree_util.tree_map_with_path(
        lambda p, m: ("embedding" in "/".join(str(getattr(k, 'key', k)) for k in p), float(m)),
        mask,
    )
    flat = jax.tree_util.tree_leaves(leaves, is_leaf=lambda x: isinstance(x, tuple))
    assert all((m == 0.0) == hit for hit, m in flat)
    assert count_parameters(params)["total_parameters"] > 0


def test_predict_and_embeddings():
    model, params, batch = _params_and_batch()
    res = predict(model, params, _loader_from_batches([batch]), return_embeddings=True)
    n_real = int(np.asarray(batch.graph_mask).sum())
    n_atoms = int(np.asarray(batch.atom_mask).sum())
    assert res["predictions"].shape == (n_real, 2)
    assert res["mol_embeddings"].shape == (n_real, 32)
    assert res["atom_embeddings"].shape == (n_atoms, 32)
    assert res["atom_mol_index"].max() == n_real - 1


def test_mc_dropout_variance_positive():
    cfg = dataclasses.replace(CFG, shell_conv_dropout=0.3, ffn_dropout=0.3)
    model, params, batch = _params_and_batch(cfg)
    res = predict_mc_dropout(model, params, _loader_from_batches([batch]), num_samples=5)
    assert res["uncertainty"].shape == res["predictions"].shape
    assert res["uncertainty"].mean() > 0  # dropout active in sampling


def test_evidential_uncertainty():
    cfg = dataclasses.replace(CFG, loss_function="evidential")
    model, params, batch = _params_and_batch(cfg)
    res = predict_evidential(model, params, _loader_from_batches([batch]), num_tasks=2)
    assert res["predictions"].shape[1] == 2
    assert np.all(res["aleatoric_uncertainty"] > 0)
    assert np.all(res["epistemic_uncertainty"] > 0)
    np.testing.assert_allclose(
        res["total_uncertainty"],
        res["aleatoric_uncertainty"] + res["epistemic_uncertainty"],
        rtol=1e-6,
    )


def test_partial_charges_extraction():
    cfg = dataclasses.replace(CFG, use_partial_charges=True)
    model, params, batch = _params_and_batch(cfg)
    charges, mol_idx = extract_partial_charges(model, params, _loader_from_batches([batch]))
    assert charges.shape == mol_idx.shape
    assert len(charges) == int(np.asarray(batch.atom_mask).sum())
    # error path: model without the feature
    model2, params2, batch2 = _params_and_batch()
    with pytest.raises(ValueError):
        extract_partial_charges(model2, params2, _loader_from_batches([batch2]))
