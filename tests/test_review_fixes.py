"""Regression tests for the round-1 and round-3 code-review findings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.chem import compute_features
from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
from aimnet_x2d_tpu.models import GNN, GNNConfig

from test_model import _random_mol


def _tiny_dataset(rng, n):
    mols = [_random_mol(rng, n_atoms=6, num_hops=2) for _ in range(n)]
    return MoleculeDataset(
        smiles=["x"] * n,
        targets=rng.normal(size=(n, 1)).astype(np.float32),
        features=mols,
        max_hops=2,
    )


def test_stacked_loader_short_final_chunk(rng):
    """5 molecules, batch 2 × 2 devices: last chunk leaves device 1 empty."""
    ds = _tiny_dataset(rng, 5)
    loader = BatchLoader(ds, batch_size=2, stack_devices=2)
    batches = list(loader)
    total = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert total == 5
    # final batch's second shard is fully masked
    last = batches[-1]
    assert not np.asarray(last.graph_mask)[1].any() or total == 5


def test_hdf5_loader_short_final_chunk(rng, tmp_path):
    from aimnet_x2d_tpu.data.hdf5 import HDF5BatchLoader, HDF5MoleculeDataset, write_hdf5

    ds = _tiny_dataset(rng, 5)
    path = str(tmp_path / "x.h5")
    write_hdf5(path, ds)
    h5 = HDF5MoleculeDataset(path)
    loader = HDF5BatchLoader(h5, batch_size=2, stack_devices=2)
    total = sum(int(np.asarray(b.graph_mask).sum()) for b in loader)
    assert total == 5
    h5.close()


@pytest.mark.parametrize("bad", ["[C", "C%", "C%ab", "[]", "C[", "%"])
def test_malformed_smiles_return_none(bad):
    """Syntax errors surfacing as ValueError/IndexError must become None,
    not crash the featurization pipeline."""
    assert compute_features(bad, 2) is None


def test_evidential_inverse_transform_gamma_only(rng):
    """predict() on an evidential model must inverse-scale only the γ head
    (multitask case used to crash on a broadcast error)."""
    from aimnet_x2d_tpu.data import PreprocessingConfig, PreprocessingPipeline
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.training.predictor import predict

    cfg = GNNConfig(
        hidden_dim=24, output_dim=2, num_shells=2, num_message_passing_layers=1,
        embedding_dim=4, ffn_num_layers=1, task_type="multitask",
        loss_function="evidential", pooling_type="mean",
    )
    model = GNN(cfg)
    batch = make_synthetic_batch(num_graphs=4, mean_atoms=8, num_hops=2, num_tasks=2)
    params = model.init(jax.random.PRNGKey(0), batch)

    pipe = PreprocessingPipeline(PreprocessingConfig(task_type="multitask"))
    pipe.fit([np.array([6, 1])] * 10, rng.normal(size=(10, 2)) * 5 + 3)

    class L:
        def __iter__(self):
            return iter([batch])

    raw = predict(model, params, L())["predictions"]
    res = predict(model, params, L(), pipeline=pipe)["predictions"]
    assert res.shape == raw.shape == (4, 8)
    # γ columns scaled, ν/α/β columns untouched
    stds = pipe.standard_scaler.stds
    means = pipe.standard_scaler.means
    np.testing.assert_allclose(
        res.reshape(4, 2, 4)[:, :, 0],
        raw.reshape(4, 2, 4)[:, :, 0] * stds + means,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        res.reshape(4, 2, 4)[:, :, 1:], raw.reshape(4, 2, 4)[:, :, 1:], rtol=1e-6
    )


def test_hdf5_smiles_roundtrip_str(rng, tmp_path):
    from aimnet_x2d_tpu.data.hdf5 import HDF5MoleculeDataset, write_hdf5

    ds = _tiny_dataset(rng, 3)
    ds.smiles[:] = ["CCO", "c1ccccc1", "CC(=O)O"]
    path = str(tmp_path / "s.h5")
    write_hdf5(path, ds)
    h5 = HDF5MoleculeDataset(path)
    loaded = h5.load_all()
    assert loaded.smiles == ["CCO", "c1ccccc1", "CC(=O)O"]
    assert h5.get_features(0).smiles == "CCO"
    h5.close()


def test_freeze_pretrained_default_head_only():
    """--freeze_pretrained without --freeze_layers must train only the
    output head (reference behavior)."""
    from aimnet_x2d_tpu.cli import parse_arguments
    from aimnet_x2d_tpu.runner import train_config_from_args

    args = parse_arguments(
        ["--data_path", "x.csv", "--transfer_learning", "m.npz", "--freeze_pretrained"]
    )
    tc = train_config_from_args(args)
    assert tc.unfreeze_patterns == ["output_layer"]


def test_hyperopt_rederives_ffn_hidden_dim():
    from aimnet_x2d_tpu.cli import parse_arguments, postprocess_arguments
    import copy

    args = parse_arguments(["--data_path", "x.csv"])  # ffn_hidden_dim -> 512
    assert args.ffn_hidden_dim == 512
    sampled = {"hidden_dim": 256}
    trial_args = copy.deepcopy(args)
    for k, v in sampled.items():
        setattr(trial_args, k, v)
    for derived, source in (("ffn_hidden_dim", "hidden_dim"),):
        if source in sampled and derived not in sampled:
            setattr(trial_args, derived, None)
    trial_args = postprocess_arguments(trial_args)
    assert trial_args.ffn_hidden_dim == 256


def test_trainer_resume_restores_lr(tmp_path, rng):
    """Preemption resume must continue with the checkpointed LR/scheduler
    state rather than resetting to the base LR."""
    from aimnet_x2d_tpu.checkpoint import TrainCheckpointer
    from aimnet_x2d_tpu.training import TrainConfig, train

    ds = _tiny_dataset(rng, 8)
    cfg = GNNConfig(hidden_dim=16, output_dim=1, num_shells=2,
                    num_message_passing_layers=1, embedding_dim=4, ffn_num_layers=1,
                    pooling_type="mean")
    model = GNN(cfg)
    loader = BatchLoader(ds, batch_size=8)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    ck = TrainCheckpointer(str(tmp_path / "ck"))
    tc = TrainConfig(epochs=4, learning_rate=1e-3, lr_scheduler="ExponentialLR",
                     lr_exp_gamma=0.5)
    train(model, params, loader, loader, tc, verbose=False,
          checkpointer=ck, checkpoint_every=2)
    ck.manager.wait_until_finished()

    r2 = train(model, params, loader, loader, tc, verbose=False,
               checkpointer=ck, checkpoint_every=2)
    # resumed from epoch 3 (ckpt at epoch 3): lr entering epoch... history
    # records post-step lr; epoch 3's scheduled lr is 1e-3 * 0.5^4
    assert [h["epoch"] for h in r2.history] == []
    # all epochs done -> second call restores epoch 3 and runs nothing; so
    # instead resume from an interrupted run:
    tc6 = TrainConfig(epochs=6, learning_rate=1e-3, lr_scheduler="ExponentialLR",
                      lr_exp_gamma=0.5)
    r3 = train(model, params, loader, loader, tc6, verbose=False,
               checkpointer=ck, checkpoint_every=100)
    assert [h["epoch"] for h in r3.history] == [4, 5]
    # epoch 4's post-step lr must continue the decay: 1e-3 * 0.5^5
    assert abs(r3.history[0]["lr"] - 1e-3 * 0.5**5) < 1e-12
    ck.close()


# --------------------------------------------------------------------- #
# Round-3 ADVICE regressions
# --------------------------------------------------------------------- #


def test_layer_dropout_seed_no_block_aliasing():
    """ADVICE r3 (medium): per-layer seed mixed with the SAME odd constant
    as the kernel's block tag made (layer l, block i) and (layer l+1,
    block i-1) draw identical dropout masks."""
    from aimnet_x2d_tpu.models.gnn import _layer_drop_seed
    from aimnet_x2d_tpu.ops.bin_mp import _dropout_mask

    base = jnp.asarray([12345], jnp.int32)
    shape = (8, 128)

    def mask(l, block, seed_fn):
        seed = jnp.uint32(seed_fn(base, l)[0])
        return np.asarray(_dropout_mask(shape, 0.5, seed, block, jnp.uint32(0)))

    # the OLD scheme aliased — sanity-check the test catches exactly that
    def old_seed(b, l):
        tag = ((l + 1) * 0x9E3779B9) & 0xFFFFFFFF
        tag = tag - (1 << 32) if tag >= (1 << 31) else tag
        return b + jnp.int32(tag)

    assert np.array_equal(mask(0, 1, old_seed), mask(1, 0, old_seed))
    # the fixed scheme must not
    assert not np.array_equal(
        mask(0, 1, _layer_drop_seed), mask(1, 0, _layer_drop_seed)
    )
    # and stays deterministic per (layer, block)
    assert np.array_equal(
        mask(2, 1, _layer_drop_seed), mask(2, 1, _layer_drop_seed)
    )


def test_prefetch_transfer_error_propagates():
    """ADVICE r3 (medium): a transfer-thread failure must raise in the
    consumer, not deadlock the collate thread on a full queue."""
    import threading

    from aimnet_x2d_tpu.training.trainer import prefetch_batches

    class FakeBatch:
        edges_slim = False
        edge_mask = np.ones(4, bool)

    loader = [FakeBatch() for _ in range(16)]
    result = {}

    def run():
        try:
            # bogus sharding -> jax.device_put raises inside the worker
            list(prefetch_batches(loader, sharding=object(), size=2))
            result["raised"] = None
        except BaseException as e:  # noqa: BLE001 - asserting propagation
            result["raised"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "prefetch deadlocked on transfer error"
    assert result["raised"] is not None


def test_evaluate_empty_shard_multihost_state_length(monkeypatch, rng):
    """ADVICE r3 (low): a host with an empty eval shard must size its
    metric state from the loader's dataset (1+4T), not a 1-task fallback
    that breaks the cross-host state merge."""
    from aimnet_x2d_tpu.parallel import multihost
    from aimnet_x2d_tpu.training import evaluator as ev

    T = 3
    n = 4
    mols = [_random_mol(np.random.default_rng(0), n_atoms=6, num_hops=2)
            for _ in range(n)]
    ds = MoleculeDataset(
        smiles=["x"] * n,
        targets=np.random.default_rng(0).normal(size=(n, T)).astype(np.float32),
        features=mols,
        max_hops=2,
    )

    class EmptyLoader:  # this host's shard yields no real samples
        def __init__(self, dataset):
            self.dataset = dataset

        def __iter__(self):
            return iter([])

    captured = {}

    def fake_allgather(x):
        captured["len"] = len(x)
        # emulate a 2nd host that saw 2 samples with unit stats
        other = np.zeros_like(x)
        other[1] = 2.0  # n_sum
        other[2] = 2.0  # acc.n
        return np.concatenate([x, other])

    monkeypatch.setattr(ev.jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost, "allgather_numpy", fake_allgather)

    cfg = GNNConfig(
        hidden_dim=16, output_dim=T, num_shells=2,
        num_message_passing_layers=1, embedding_dim=4, ffn_num_layers=1,
        task_type="multitask", pooling_type="mean",
    )
    metrics = ev.evaluate(GNN(cfg), None, EmptyLoader(ds), config=None,
                          loss_fn=lambda p, t, m: jnp.float32(0.0))
    # state vector = [loss_sum, n_sum] + MetricAccumulator state (1 + 4T)
    assert captured["len"] == 3 + 4 * T
    assert "mae" in metrics


def test_scratch_rotation_covers_prefetch(rng):
    """Round-4 root cause: the two-stage prefetch holds up to ~7 batches in
    flight, but loaders rotated only TWO native-builder scratch sets, so a
    queued batch's host buffers were overwritten before jax.device_put read
    them — features decorrelated from targets, and every TPU training run
    silently collapsed to mean prediction (quality R² 0.29 vs 0.885).

    Asserts (a) the rotation constant covers the prefetch pipeline depth,
    and (b) with the TPU scratch path forced on, a built batch's arrays
    survive the construction of SCRATCH_SETS-1 further batches bit-exactly.
    """
    import numpy as np

    from aimnet_x2d_tpu.chem.native import native_available
    from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
    from aimnet_x2d_tpu.data.native_batch import SCRATCH_SETS

    # prefetch pipeline: 1 being-built + size q_host + 1 in-transfer +
    # size q_dev + 1 in-step  (training/trainer.py::prefetch_batches size=2)
    assert SCRATCH_SETS >= 1 + 2 + 1 + 2 + 1

    if not native_available():
        import pytest

        pytest.skip("native builder required")

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "CC(C)C",
              "OCC(O)CO", "c1ccncc1", "CCOC(=O)C", "NC(=O)N"] * 20
    ds = MoleculeDataset.from_smiles(
        smiles, rng.normal(size=(len(smiles), 3)).astype(np.float32), max_hops=3
    )
    loader = BatchLoader(ds, 16, shuffle=True, seed=0, binned=True)
    assert loader.binned, "test requires the binned native path"
    # force the TPU scratch behavior on the CPU backend
    loader._scratches = [{} for _ in range(SCRATCH_SETS)]
    loader._scratch_i = 0

    it = iter(loader)
    b0 = next(it)
    snaps = {
        name: np.array(getattr(b0, name), copy=True)
        for name in ("atom_type", "atom_mol", "bin_adj", "pool_mat", "targets")
        if getattr(b0, name) is not None
    }
    for _ in range(SCRATCH_SETS - 1):
        next(it)
    mutated = [
        k for k, v in snaps.items()
        if not np.array_equal(v, np.asarray(getattr(b0, k)))
    ]
    assert not mutated, f"batch buffers overwritten while in flight: {mutated}"
