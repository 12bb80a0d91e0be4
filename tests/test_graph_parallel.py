"""Edge-partitioned (graph-parallel) training must match single-device
numerics on a virtual mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.data.batching import shard_edges
from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
from aimnet_x2d_tpu.models import GNN, GNNConfig
from aimnet_x2d_tpu.parallel import create_mesh
from aimnet_x2d_tpu.parallel.graph_parallel import make_graph_parallel_train_step
from aimnet_x2d_tpu.training import TrainConfig
from aimnet_x2d_tpu.training.trainer import (
    make_loss_fn,
    make_optimizer,
    make_train_step,
)

from test_model import _random_mol

CFG = GNNConfig(
    hidden_dim=32, output_dim=1, num_shells=2, num_message_passing_layers=2,
    embedding_dim=8, ffn_num_layers=2, pooling_type="attention",
    shell_conv_dropout=0.0, ffn_dropout=0.0,
)


def _dataset(rng, n=32, num_hops=2):
    mols = [_random_mol(rng, n_atoms=int(rng.integers(5, 10)), num_hops=num_hops) for _ in range(n)]
    targets = rng.normal(size=(n, 1)).astype(np.float32)
    return MoleculeDataset(smiles=["x"] * n, targets=targets, features=mols, max_hops=num_hops)


def test_shard_edges_partition(rng):
    ds = _dataset(rng)
    batch = next(iter(BatchLoader(ds, batch_size=8)))
    shards = shard_edges(batch, 4)
    assert len(shards) == 4
    total_real = sum(int(s.edge_mask.sum()) for s in shards)
    assert total_real == int(batch.edge_mask.sum())
    # atoms identical across shards
    for s in shards:
        np.testing.assert_array_equal(s.atom_type, batch.atom_type)


def test_graph_parallel_matches_single_device(rng):
    """2 data × 4 graph mesh step == single-device step on the same batch."""
    ds = _dataset(rng, n=16)
    model = GNN(CFG)
    tc = TrainConfig(learning_rate=1e-3)
    mesh = create_mesh(num_data=2, num_graph=4)

    loader = BatchLoader(ds, batch_size=8, stack_devices=2, edge_shards=4)
    stacked = next(iter(loader))
    assert stacked.atom_type.ndim == 3  # (data, graph, A)
    assert stacked.edge_src.shape[:2] == (2, 4)

    flat0 = jax.tree_util.tree_map(lambda x: x[0, 0], stacked)
    params = model.init(jax.random.PRNGKey(0), flat0)
    opt = make_optimizer(tc, params)

    gp_step = make_graph_parallel_train_step(model, tc, opt, mesh)
    # the step donates its params/opt_state buffers — pass copies so the
    # originals stay alive for the single-device reference below
    p_gp, _, loss_gp, n_gp = gp_step(
        jax.tree_util.tree_map(jnp.copy, params),
        opt.init(params),
        stacked,
        jnp.float32(1e-3),
        jax.random.PRNGKey(7),
    )

    # single-device reference: weighted mean over the two data shards with
    # the SAME per-shard loss function (dropout disabled by cfg)
    loss_fn = make_loss_fn(model, tc)
    losses, counts, grads_acc = [], [], None
    for d in range(2):
        full = jax.tree_util.tree_map(lambda x: x[d, 0], stacked)
        # reassemble full edge set for shard d
        parts = [jax.tree_util.tree_map(lambda x: x[d, g], stacked) for g in range(4)]
        full = dataclasses.replace(
            full,
            edge_src=np.concatenate([p.edge_src for p in parts]),
            edge_dst=np.concatenate([p.edge_dst for p in parts]),
            edge_hop=np.concatenate([p.edge_hop for p in parts]),
            edge_mask=np.concatenate([p.edge_mask for p in parts]),
        )
        (l, g) = jax.value_and_grad(loss_fn)(params, full, jax.random.PRNGKey(0))
        n = float(np.sum(full.graph_mask))
        losses.append(float(l) * n)
        counts.append(n)
        g = jax.tree_util.tree_map(lambda x: x * n, g)
        grads_acc = g if grads_acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, grads_acc, g
        )
    n_tot = sum(counts)
    expected_loss = sum(losses) / n_tot
    np.testing.assert_allclose(float(loss_gp), expected_loss, rtol=1e-5)
    assert float(n_gp) == n_tot

    # updated params must match a manual update with the averaged grads
    grads = jax.tree_util.tree_map(lambda g: g / n_tot, grads_acc)
    import optax

    upd, _ = opt.update(grads, opt.init(params), params)
    upd = jax.tree_util.tree_map(lambda u: u * 1e-3, upd)
    p_ref = optax.apply_updates(params, upd)
    # atol covers Adam noise on mathematically-zero gradients (attention
    # head biases cancel in per-graph softmax; fp reassociation leaves
    # ~1e-12 residue that m/(sqrt(v)+eps) amplifies to O(lr) regardless of
    # parallelism) — every other leaf matches to rtol.
    for a, b in zip(jax.tree_util.tree_leaves(p_gp), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=3e-6)


def test_graph_parallel_training_decreases_loss(rng):
    ds = _dataset(rng, n=64)
    model = GNN(CFG)
    tc = TrainConfig(learning_rate=3e-3)
    mesh = create_mesh(num_data=4, num_graph=2)
    loader = BatchLoader(ds, batch_size=8, stack_devices=4, edge_shards=2, shuffle=True)

    stacked = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), jax.tree_util.tree_map(lambda x: x[0, 0], stacked))
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    step = make_graph_parallel_train_step(model, tc, opt, mesh)

    losses = []
    for epoch in range(4):
        loader.set_epoch(epoch)
        tot = cnt = 0.0
        for batch in loader:
            params, opt_state, loss, n = step(
                params, opt_state, batch, jnp.float32(3e-3), jax.random.PRNGKey(epoch)
            )
            tot += float(loss) * float(n)
            cnt += float(n)
        losses.append(tot / cnt)
    assert losses[-1] < losses[0]
