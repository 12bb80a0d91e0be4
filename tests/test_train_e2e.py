"""End-to-end: QM9 sample CSV → featurize → preprocess → train → loss ↓.

This is BASELINE.json config 1 (single-task gap, mean pooling) at reduced
size, CPU-runnable (SURVEY.md §7 step 3)."""

import os

import jax
import numpy as np
import pytest

from aimnet_x2d_tpu.data import PreprocessingConfig, PreprocessingPipeline
from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
from aimnet_x2d_tpu.data.io import load_dataset, split_dataset
from aimnet_x2d_tpu.models import GNN, GNNConfig
from aimnet_x2d_tpu.training import TrainConfig, train

from conftest import SAMPLE_DATA, has_sample_data


@pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")
def test_qm9_single_task_loss_decreases():
    smiles, targets = load_dataset(
        os.path.join(SAMPLE_DATA, "val.csv"), target_column="gap"
    )
    smiles, targets = smiles[:300], targets[:300]
    (tr_s, tr_t), (va_s, va_t), _ = split_dataset(smiles, targets)

    train_ds = MoleculeDataset.from_smiles(tr_s, tr_t, max_hops=2)
    val_ds = MoleculeDataset.from_smiles(va_s, va_t, max_hops=2)

    pipe = PreprocessingPipeline(PreprocessingConfig(apply_standard_scaling=True))
    pipe.fit(train_ds.atomic_numbers(), train_ds.targets)
    train_ds = train_ds.with_targets(pipe.transform(train_ds.atomic_numbers(), train_ds.targets))
    val_ds = val_ds.with_targets(pipe.transform(val_ds.atomic_numbers(), val_ds.targets))

    cfg = GNNConfig(
        hidden_dim=64,
        output_dim=1,
        num_shells=2,
        num_message_passing_layers=2,
        embedding_dim=16,
        ffn_num_layers=2,
        pooling_type="mean",
        shell_conv_dropout=0.0,
        ffn_dropout=0.0,
    )
    model = GNN(cfg)
    train_loader = BatchLoader(train_ds, batch_size=32, shuffle=True, seed=0)
    val_loader = BatchLoader(val_ds, batch_size=32)
    params = model.init(jax.random.PRNGKey(42), next(iter(train_loader)))

    tc = TrainConfig(epochs=5, learning_rate=1e-3)
    result = train(
        model, params, train_loader, val_loader, tc, pipeline=pipe, verbose=False
    )

    losses = [h["train_loss"] for h in result.history]
    assert losses[-1] < losses[0] * 0.8, losses
    assert result.best_val_loss < losses[0]
    # metrics present and finite
    assert np.isfinite(result.history[-1]["val_mae"])


@pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")
def test_qm9_multitask_sae_smoke():
    """Multitask (3 targets) with SAE on one subtask — one epoch smoke."""
    smiles, targets = load_dataset(
        os.path.join(SAMPLE_DATA, "val.csv"),
        multi_target_columns=["gap", "homo", "u0_atom"],
    )
    smiles, targets = smiles[:120], targets[:120]
    ds = MoleculeDataset.from_smiles(smiles, targets, max_hops=2)
    pipe = PreprocessingPipeline(
        PreprocessingConfig(
            apply_sae=True, sae_subtasks=[2], task_type="multitask"
        )
    )
    ds = ds.with_targets(pipe.fit_transform(ds.atomic_numbers(), ds.targets))
    # SAE should dramatically reduce the scale of the atomization energy
    assert np.abs(ds.targets[:, 2]).mean() < 10.0

    cfg = GNNConfig(
        hidden_dim=48,
        output_dim=3,
        num_shells=2,
        num_message_passing_layers=1,
        embedding_dim=8,
        ffn_num_layers=1,
        pooling_type="attention",
    )
    model = GNN(cfg)
    loader = BatchLoader(ds, batch_size=24, shuffle=True)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    tc = TrainConfig(
        epochs=2,
        learning_rate=1e-3,
        task_type="multitask",
        multitask_weights=[1.0, 1.0, 1.0],
    )
    result = train(model, params, loader, loader, tc, pipeline=pipe, verbose=False)
    assert np.isfinite(result.best_val_loss)
