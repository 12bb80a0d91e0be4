"""Aux subsystems: profiling meter, tracker fallback, orbax checkpoint
resume, multihost helpers on single process."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.utils.profiling import StepTimer
from aimnet_x2d_tpu.utils.tracking import Tracker, create_tracker


def test_step_timer_edges_per_sec():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(num_real_edges=1000)
    s = t.summary(skip_warmup=1)
    assert s["steps"] == 2
    assert 8 <= s["mean_step_ms"] <= 50
    assert s["edges_per_sec"] > 0


def test_tracker_noop_fallback():
    class Args:
        enable_wandb = False

    t = create_tracker(Args())
    assert isinstance(t, Tracker) and not t.enabled
    t.log({"a": 1})
    t.finish()

    class Args2:
        enable_wandb = True
        wandb_project = "x"
        wandb_entity = None
        wandb_tag_list = None

    t2 = create_tracker(Args2())  # wandb not installed → degrade gracefully
    assert not t2.enabled


def test_checkpoint_resume(tmp_path):
    from aimnet_x2d_tpu.checkpoint import TrainCheckpointer

    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    opt_state = {"m": jnp.zeros(4)}
    ck = TrainCheckpointer(str(tmp_path / "ckpt"), keep=2)
    ck.save(0, params, opt_state)
    ck.save(1, jax.tree_util.tree_map(lambda x: x * 2, params), opt_state)
    ck.manager.wait_until_finished()
    assert ck.latest_epoch() == 1
    restored = ck.restore(params, opt_state)
    assert restored is not None
    epoch, p, s, aux, best = restored
    assert best is None  # no best_params item saved
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(p["w"]), np.arange(4.0) * 2)
    ck.close()


def test_checkpoint_aux_roundtrip(tmp_path):
    from aimnet_x2d_tpu.checkpoint import TrainCheckpointer

    params = {"w": jnp.ones(2)}
    opt_state = {"m": jnp.zeros(2)}
    ck = TrainCheckpointer(str(tmp_path / "ck2"))
    ck.save(0, params, opt_state, aux={"lr": 1e-4, "best_val": 0.5, "sched_num_bad": 3.0})
    ck.manager.wait_until_finished()
    _, _, _, aux, _ = ck.restore(params, opt_state)
    assert aux["lr"] == 1e-4 and aux["best_val"] == 0.5 and aux["sched_num_bad"] == 3.0
    ck.close()


def test_trainer_resume_skips_epochs(tmp_path, rng):
    from aimnet_x2d_tpu.checkpoint import TrainCheckpointer
    from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
    from aimnet_x2d_tpu.models import GNN, GNNConfig
    from aimnet_x2d_tpu.training import TrainConfig, train

    from test_model import _random_mol

    mols = [_random_mol(rng, n_atoms=6, num_hops=2) for _ in range(16)]
    ds = MoleculeDataset(
        smiles=["x"] * 16,
        targets=rng.normal(size=(16, 1)).astype(np.float32),
        features=mols,
        max_hops=2,
    )
    cfg = GNNConfig(hidden_dim=16, output_dim=1, num_shells=2,
                    num_message_passing_layers=1, embedding_dim=4, ffn_num_layers=1,
                    pooling_type="mean")
    model = GNN(cfg)
    loader = BatchLoader(ds, batch_size=8)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))

    ck = TrainCheckpointer(str(tmp_path / "ck"))
    tc = TrainConfig(epochs=3, learning_rate=1e-3)
    r1 = train(model, params, loader, loader, tc, verbose=False,
               checkpointer=ck, checkpoint_every=2)
    ck.manager.wait_until_finished()
    assert ck.latest_epoch() == 1  # saved after epoch 1 (2nd epoch)

    # resume: a fresh train() continues from epoch 2 only
    r2 = train(model, params, loader, loader, tc, verbose=False,
               checkpointer=ck, checkpoint_every=2)
    assert [h["epoch"] for h in r2.history] == [2]
    ck.close()


def test_multihost_single_process_helpers():
    from aimnet_x2d_tpu.parallel import multihost as mh

    assert mh.process_count() == 1 and mh.is_primary()
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = mh.allgather_numpy(x)
    np.testing.assert_array_equal(out, x)
    obj = {"k": [1, 2, 3]}
    assert mh.broadcast_pyobj(obj) == obj
    mh.sync()


def test_metric_accumulator_matches_oneshot():
    """Streaming MetricAccumulator (chunked + multihost-merged) must equal
    compute_metrics on the concatenated arrays."""
    import numpy as np

    from aimnet_x2d_tpu.training.evaluator import (
        MetricAccumulator,
        compute_metrics,
    )

    rng = np.random.default_rng(3)
    preds = rng.normal(size=(101, 4))
    targets = rng.normal(size=(101, 4)) + 0.5 * preds

    one = compute_metrics(preds, targets)

    acc = MetricAccumulator(4)
    for lo in range(0, 101, 17):  # ragged chunks
        acc.update(preds[lo : lo + 17], targets[lo : lo + 17])
    got = acc.finalize()
    assert np.isclose(got["mae"], one["mae"])
    assert np.isclose(got["rmse"], one["rmse"])
    assert np.isclose(got["r2"], one["r2"])
    np.testing.assert_allclose(got["per_task"]["r2"], one["per_task"]["r2"])

    # two-host merge path
    a, b = MetricAccumulator(4), MetricAccumulator(4)
    a.update(preds[:40], targets[:40])
    b.update(preds[40:], targets[40:])
    a.merge_state(b.state())
    got2 = a.finalize()
    np.testing.assert_allclose(got2["per_task"]["mae"], one["per_task"]["mae"])
    np.testing.assert_allclose(got2["per_task"]["r2"], one["per_task"]["r2"])
