"""Halo-exchange graph partitioning (parallel/halo.py + ops/halo.py).

Equality harness mirrors tests/test_graph_parallel.py: the atom+edge
partitioned execution on a virtual CPU mesh must reproduce single-device
numerics exactly, including molecules force-split across devices.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from aimnet_x2d_tpu.data.batching import collate
from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
from aimnet_x2d_tpu.models import GNN, GNNConfig
from aimnet_x2d_tpu.parallel import create_mesh, partition_halo
from aimnet_x2d_tpu.parallel.graph_parallel import make_graph_parallel_train_step
from aimnet_x2d_tpu.training import TrainConfig
from aimnet_x2d_tpu.training.trainer import make_loss_fn, make_optimizer

from test_model import _random_mol

CFG = GNNConfig(
    hidden_dim=32, output_dim=2, num_shells=2, num_message_passing_layers=2,
    embedding_dim=8, ffn_num_layers=2, pooling_type="attention",
    task_type="multitask", shell_conv_dropout=0.0, ffn_dropout=0.0,
)


def _batch(rng, n=12, num_hops=2, with_stereo=False, big=None):
    sizes = [int(rng.integers(5, 10)) for _ in range(n)]
    if big:
        sizes[0] = big
    mols = [
        _random_mol(rng, n_atoms=s, num_hops=num_hops, with_stereo=with_stereo and s >= 5)
        for s in sizes
    ]
    targets = rng.normal(size=(n, 2)).astype(np.float32)
    return collate(mols, targets, num_hops=num_hops)


def test_partition_conservation(rng):
    batch = _batch(rng, n=12)
    stacked, stats = partition_halo(batch, 4, return_stats=True)
    assert stacked.atom_type.shape[0] == 4
    # atoms and edges conserved
    assert int(stacked.atom_mask.sum()) == int(batch.atom_mask.sum())
    assert int(stacked.edge_mask.sum()) == int(batch.edge_mask.sum())
    # hop histogram conserved
    real_hops = np.asarray(batch.edge_hop)[np.asarray(batch.edge_mask)]
    part_hops = np.asarray(stacked.edge_hop)[np.asarray(stacked.edge_mask)]
    np.testing.assert_array_equal(np.sort(real_hops), np.sort(part_hops))
    # whole molecules fit -> no cuts at QM9-like sizes
    assert stats.split_molecules == 0
    assert stats.cut_edges == 0
    assert stats.halo_fraction == 0.0
    # graph-level data replicated
    for g in range(4):
        np.testing.assert_array_equal(stacked.targets[g], batch.targets)


def _halo_forward(cfg, params, stacked, mesh):
    gmodel = GNN(dataclasses.replace(cfg, graph_axis="graph"))

    def fwd(p, b):
        local = jax.tree_util.tree_map(lambda x: x[0], b)
        return gmodel.apply(p, local, deterministic=True).predictions

    smapped = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(("graph",))), out_specs=P(),
        check_vma=False,
    )
    return smapped(params, stacked)


@pytest.mark.parametrize("G", [2, 4])
def test_halo_forward_matches_single_device(rng, G):
    cfg = dataclasses.replace(CFG, use_stereochemistry=True, use_partial_charges=True)
    batch = _batch(rng, n=10, with_stereo=True)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked, stats = partition_halo(batch, G, return_stats=True)
    mesh = create_mesh(num_data=8 // G, num_graph=G)
    out = _halo_forward(cfg, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_halo_split_molecule_matches_single_device(rng):
    """A 60-atom chain forced across 4 devices: halo path must still equal
    the single-device forward, and the stats must show the cut."""
    batch = _batch(rng, n=6, big=60)
    model = GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked, stats = partition_halo(batch, 4, return_stats=True)
    assert stats.split_molecules >= 1
    assert stats.cut_edges > 0
    assert stats.halo_rows > 0
    # boundary exchange is small relative to the atom set
    assert stats.halo_fraction < 0.5

    mesh = create_mesh(num_data=2, num_graph=4)
    out = _halo_forward(CFG, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_halo_train_step_matches_single_device(rng):
    """(data=2, graph=2) halo train step == manual weighted-mean update."""
    model = GNN(CFG)
    tc = TrainConfig(learning_rate=1e-3, task_type="multitask")
    mesh = create_mesh(num_data=2, num_graph=2, devices=jax.devices()[:4])

    shard_batches = [_batch(rng, n=8) for _ in range(2)]
    halo_parts = []
    slots = {}
    for b in shard_batches:
        p, stats = partition_halo(b, 2, return_stats=True, **slots)
        slots = {
            "atom_slots": stats.atom_slots_per_device,
            "edge_slots": stats.edge_slots_per_device,
            "halo_pair_slots": stats.halo_pair_slots,
        }
        halo_parts.append(p)
    halo_parts = [
        partition_halo(b, 2, **slots) for b in shard_batches
    ]  # repartition at final pinned slots for a uniform stack
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *halo_parts)

    params = model.init(jax.random.PRNGKey(0), shard_batches[0])
    opt = make_optimizer(tc, params)
    step = make_graph_parallel_train_step(model, tc, opt, mesh)
    p_halo, _, loss_halo, n_halo = step(
        jax.tree_util.tree_map(jnp.copy, params),
        opt.init(params),
        stacked,
        jnp.float32(1e-3),
        jax.random.PRNGKey(7),
    )

    loss_fn = make_loss_fn(model, tc)
    losses, counts, grads_acc = [], [], None
    for b in shard_batches:
        l, g = jax.value_and_grad(loss_fn)(params, b, jax.random.PRNGKey(0))
        n = float(np.sum(b.graph_mask))
        losses.append(float(l) * n)
        counts.append(n)
        g = jax.tree_util.tree_map(lambda x: x * n, g)
        grads_acc = g if grads_acc is None else jax.tree_util.tree_map(
            lambda a, c: a + c, grads_acc, g
        )
    n_tot = sum(counts)
    np.testing.assert_allclose(float(loss_halo), sum(losses) / n_tot, rtol=1e-5)
    assert float(n_halo) == n_tot

    import optax

    grads = jax.tree_util.tree_map(lambda g: g / n_tot, grads_acc)
    upd, _ = opt.update(grads, opt.init(params), params)
    upd = jax.tree_util.tree_map(lambda u: u * 1e-3, upd)
    p_ref = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree_util.tree_leaves(p_halo), jax.tree_util.tree_leaves(p_ref)):
        # atol: attention head biases have mathematically-zero gradients
        # (they cancel in the per-graph softmax); the ~1e-12 fp residue is
        # amplified by Adam's m/(sqrt(v)+eps) to O(lr·1e-2) regardless of
        # parallelism (verified leaf-by-leaf; all other leaves match rtol)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_loader_halo_shards(rng):
    mols = [_random_mol(rng, n_atoms=int(rng.integers(5, 10)), num_hops=2) for _ in range(32)]
    targets = rng.normal(size=(32, 2)).astype(np.float32)
    ds = MoleculeDataset(smiles=["x"] * 32, targets=targets, features=mols, max_hops=2)
    loader = BatchLoader(ds, batch_size=8, stack_devices=2, halo_shards=2)
    shapes = set()
    for batch in loader:
        assert batch.atom_type.ndim == 3  # (data, graph, A_loc)
        assert batch.atom_type.shape[:2] == (2, 2)
        assert batch.halo_send_idx.shape[:2] == (2, 2)
        shapes.add(tuple(batch.atom_type.shape) + tuple(batch.edge_src.shape))
    assert len(shapes) == 1  # pinned static shapes across steps


def test_stereo_spanning_split_recovers(rng):
    """A stereo row that would straddle a cut slides the cut to a safe
    position instead of aborting (round-3 recovery; the abort remains only
    when no safe cut exists), and the recovered partition still reproduces
    single-device numerics."""
    big = _random_mol(rng, n_atoms=64, num_hops=2)
    # a tetrahedral center whose neighbors straddle the midpoint cut
    big.tet_nbrs = np.array([[30, 31, 32, 33]], np.int32)
    big.cis_pairs = np.zeros((0, 2), np.int32)
    big.trans_pairs = np.zeros((0, 2), np.int32)
    mols = [big]
    targets = rng.normal(size=(1, 2)).astype(np.float32)
    batch = collate(mols, targets, num_hops=2)
    stacked, stats = partition_halo(batch, 4, return_stats=True)
    assert stats.split_molecules == 1  # still split, just at safe offsets

    cfg = dataclasses.replace(CFG, use_stereochemistry=True)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions
    mesh = create_mesh(num_data=2, num_graph=4)
    out = _halo_forward(cfg, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_stereo_unsplittable_degrades_gracefully(rng):
    """When EVERY interior position severs some stereo row, the cut slides
    to the end of the molecule — the partition degenerates (one device
    holds it whole, others go empty) instead of aborting, and numerics
    still match single-device."""
    big = _random_mol(rng, n_atoms=32, num_hops=2)
    # overlapping tet rows covering every interior cut position
    rows = [[i, i + 1, i + 2, i + 3] for i in range(0, 29)]
    big.tet_nbrs = np.array(rows, np.int32)
    big.cis_pairs = np.zeros((0, 2), np.int32)
    big.trans_pairs = np.zeros((0, 2), np.int32)
    batch = collate([big], rng.normal(size=(1, 2)).astype(np.float32), num_hops=2)
    stacked, stats = partition_halo(batch, 4, return_stats=True)
    assert stats.split_molecules == 0  # collapsed, not severed
    per_dev = np.asarray(stacked.atom_mask).sum(axis=1)
    assert per_dev[0] == 32 and per_dev[1:].sum() == 0

    cfg = dataclasses.replace(CFG, use_stereochemistry=True)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions
    mesh = create_mesh(num_data=2, num_graph=4)
    out = _halo_forward(cfg, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_edge_and_halo_shards_exclusive(rng):
    mols = [_random_mol(rng, n_atoms=6, num_hops=2) for _ in range(8)]
    ds = MoleculeDataset(
        smiles=["x"] * 8,
        targets=rng.normal(size=(8, 2)).astype(np.float32),
        features=mols,
        max_hops=2,
    )
    with pytest.raises(ValueError, match="exclusive"):
        BatchLoader(ds, batch_size=4, stack_devices=2, edge_shards=2, halo_shards=2)


# --------------------------------------------------------------------- #
# Binned halo shards (round 3): per-device megakernel datapath with the
# boundary all_to_all between layers (parallel/halo.py binned=True,
# ops/halo.py feature-major helpers, ops/bin_mp.py ext-agg kernel).
# --------------------------------------------------------------------- #


def test_binned_partition_edge_coverage(rng):
    """bin_adj + halo_adj together cover every real edge exactly once,
    including self-halo rows from chunked giant fragments (ab=16 forces
    same-device cross-bin edges)."""
    batch = _batch(rng, n=10, big=60)
    stacked, stats = partition_halo(batch, 4, return_stats=True, binned=True, ab=16)
    assert stats.bin_slots > 0
    assert int(stacked.atom_mask.sum()) == int(batch.atom_mask.sum())
    total_edges = int(np.asarray(batch.edge_mask).sum())
    covered = int(stacked.bin_adj.sum()) + int(stacked.halo_adj.sum())
    assert covered == total_edges
    # flat fallback arrays conserved too (same shards serve both paths)
    assert int(stacked.edge_mask.sum()) == total_edges
    # whole-molecule case: empty halo, everything in bin_adj
    small = _batch(rng, n=10)
    st2, s2 = partition_halo(small, 4, return_stats=True, binned=True)
    assert int(st2.halo_adj.sum()) == 0
    assert int(st2.bin_adj.sum()) == int(np.asarray(small.edge_mask).sum())


@pytest.mark.parametrize("G", [2, 4])
def test_binned_halo_forward_matches_single_device(rng, G, monkeypatch):
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    batch = _batch(rng, n=10)
    model = GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked = partition_halo(batch, G, binned=True)
    assert stacked.bin_adj is not None and stacked.halo_adj is not None
    mesh = create_mesh(num_data=8 // G, num_graph=G)
    out = _halo_forward(CFG, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_binned_halo_split_molecule_matches_single_device(rng, monkeypatch):
    """A 60-atom chain split across 4 devices AND chunked within devices
    (ab=16): true halo + self-halo rows, megakernel per-device."""
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    batch = _batch(rng, n=6, big=60)
    model = GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked, stats = partition_halo(batch, 4, return_stats=True, binned=True, ab=16)
    assert stats.split_molecules >= 1
    assert stats.cut_edges > 0
    mesh = create_mesh(num_data=2, num_graph=4)
    out = _halo_forward(CFG, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_binned_halo_train_step_matches_single_device(rng, monkeypatch):
    """(data=2, graph=2) binned-halo train step == manual weighted-mean
    update (same harness as the flat-halo test above)."""
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    model = GNN(CFG)
    tc = TrainConfig(learning_rate=1e-3, task_type="multitask")
    mesh = create_mesh(num_data=2, num_graph=2, devices=jax.devices()[:4])

    shard_batches = [_batch(rng, n=8), _batch(rng, n=8, big=40)]
    slots = {}
    for b in shard_batches:
        _, stats = partition_halo(b, 2, return_stats=True, binned=True, **slots)
        slots = {
            "edge_slots": stats.edge_slots_per_device,
            "halo_pair_slots": stats.halo_pair_slots,
            "bin_slots": stats.bin_slots,
        }
    halo_parts = [partition_halo(b, 2, binned=True, **slots) for b in shard_batches]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *halo_parts)

    params = model.init(jax.random.PRNGKey(0), shard_batches[0])
    opt = make_optimizer(tc, params)
    step = make_graph_parallel_train_step(model, tc, opt, mesh)
    p_halo, _, loss_halo, n_halo = step(
        jax.tree_util.tree_map(jnp.copy, params),
        opt.init(params),
        stacked,
        jnp.float32(1e-3),
        jax.random.PRNGKey(7),
    )

    loss_fn = make_loss_fn(model, tc)
    losses, counts, grads_acc = [], [], None
    for b in shard_batches:
        l, g = jax.value_and_grad(loss_fn)(params, b, jax.random.PRNGKey(0))
        n = float(np.sum(b.graph_mask))
        losses.append(float(l) * n)
        counts.append(n)
        g = jax.tree_util.tree_map(lambda x: x * n, g)
        grads_acc = g if grads_acc is None else jax.tree_util.tree_map(
            lambda a, c: a + c, grads_acc, g
        )
    n_tot = sum(counts)
    np.testing.assert_allclose(float(loss_halo), sum(losses) / n_tot, rtol=1e-5)
    assert float(n_halo) == n_tot

    import optax

    grads = jax.tree_util.tree_map(lambda g: g / n_tot, grads_acc)
    upd, _ = opt.update(grads, opt.init(params), params)
    upd = jax.tree_util.tree_map(lambda u: u * 1e-3, upd)
    p_ref = optax.apply_updates(params, upd)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_halo), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_loader_binned_halo_shards(rng):
    mols = [_random_mol(rng, n_atoms=int(rng.integers(5, 10)), num_hops=2) for _ in range(32)]
    targets = rng.normal(size=(32, 2)).astype(np.float32)
    ds = MoleculeDataset(smiles=["x"] * 32, targets=targets, features=mols, max_hops=2)
    loader = BatchLoader(
        ds, batch_size=8, stack_devices=2, halo_shards=2, binned=True, bin_ab=32
    )
    shapes = set()
    for batch in loader:
        assert batch.atom_type.shape[:2] == (2, 2)
        assert batch.bin_adj is not None and batch.bin_adj.ndim == 5
        assert batch.halo_adj is not None
        assert batch.pool_mat is None
        shapes.add(tuple(batch.atom_type.shape) + tuple(batch.edge_src.shape))
    assert len(shapes) == 1  # pinned static shapes across steps


def test_binned_halo_collective_overlaps_local_agg(rng, monkeypatch):
    """Comm/compute overlap structure (SURVEY §7 hard-parts, BASELINE.json
    'boundary exchange overlapped with neighborhood aggregation'): in each
    MP layer the boundary ``all_to_all`` and the LOCAL per-bin aggregation
    matmul must be mutually data-independent — both consume only the
    previous layer's output — so XLA's async-collective scheduler is free
    to run them concurrently.  Asserted structurally on the jaxpr (data
    independence is preserved through compilation; a dependence in either
    direction would serialize them on every backend)."""
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    batch = _batch(rng, n=8)
    model = GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), batch)
    stacked = partition_halo(batch, 2, binned=True)
    mesh = create_mesh(num_data=4, num_graph=2)
    gmodel = GNN(dataclasses.replace(CFG, graph_axis="graph"))

    def fwd(p, b):
        local = jax.tree_util.tree_map(lambda x: x[0], b)
        return gmodel.apply(p, local, deterministic=True).predictions

    smapped = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(("graph",))), out_specs=P(),
        check_vma=False,
    )
    jaxpr = jax.make_jaxpr(smapped)(params, stacked)
    inner = next(
        e.params["jaxpr"]
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name in ("shard_map", "smap")
    )

    producer = {}
    for i, eqn in enumerate(inner.eqns):
        for v in eqn.outvars:
            producer[v] = i

    def ancestors(i):
        seen, stack = set(), [i]
        while stack:
            j = stack.pop()
            for v in inner.eqns[j].invars:
                if not hasattr(v, "count"):  # Literal (unhashable)
                    continue
                p = producer.get(v)
                if p is not None and p not in seen:
                    seen.add(p)
                    stack.append(p)
        return seen

    a2a = [
        i for i, e in enumerate(inner.eqns) if e.primitive.name == "all_to_all"
    ]
    # local per-bin aggregation = the batched dot_generals (bin_adj operand)
    agg = [
        i
        for i, e in enumerate(inner.eqns)
        if e.primitive.name == "dot_general"
        and e.params["dimension_numbers"][1][0]  # has batch dims
    ]
    L = CFG.num_message_passing_layers
    assert len(a2a) == L and len(agg) == L, (a2a, agg)
    for c, d in zip(a2a, agg):
        assert c not in ancestors(d), "local agg waits on the collective"
        assert d not in ancestors(c), "collective waits on the local agg"


# --------------------------------------------------------------------- #
# Binned halo shards + charge/stereo injections (round 4, VERDICT r3
# item 7): BASELINE.json config 3 on a graph-partitioned mesh — the
# per-layer feature-major injections run between the ext-agg kernels,
# charge equilibration psums per-molecule partials over the graph axis.
# --------------------------------------------------------------------- #

CFG_INJECT = dataclasses.replace(
    CFG, use_partial_charges=True, use_stereochemistry=True
)


@pytest.mark.parametrize("G", [2, 4])
def test_binned_halo_inject_forward_matches_single_device(rng, G, monkeypatch):
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    batch = _batch(rng, n=10, with_stereo=True)
    model = GNN(CFG_INJECT)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked = partition_halo(batch, G, binned=True)
    assert stacked.bin_adj is not None and stacked.halo_adj is not None
    mesh = create_mesh(num_data=8 // G, num_graph=G)
    out = _halo_forward(CFG_INJECT, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_binned_halo_inject_split_molecule_matches_single_device(rng, monkeypatch):
    """A split molecule with charges on: Q_u/F_u partials must psum over
    the graph axis for the split molecule to equilibrate globally."""
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    batch = _batch(rng, n=6, big=60, with_stereo=True)
    model = GNN(CFG_INJECT)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions

    stacked, stats = partition_halo(batch, 4, return_stats=True, binned=True, ab=16)
    assert stats.split_molecules >= 1
    mesh = create_mesh(num_data=2, num_graph=4)
    out = _halo_forward(CFG_INJECT, params, stacked, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_binned_halo_inject_train_step_matches_single_device(rng, monkeypatch):
    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    model = GNN(CFG_INJECT)
    tc = TrainConfig(learning_rate=1e-3, task_type="multitask")
    mesh = create_mesh(num_data=2, num_graph=2, devices=jax.devices()[:4])

    shard_batches = [
        _batch(rng, n=8, with_stereo=True),
        _batch(rng, n=8, big=40, with_stereo=True),
    ]
    slots = {}
    for b in shard_batches:
        _, stats = partition_halo(b, 2, return_stats=True, binned=True, **slots)
        slots = {
            "edge_slots": stats.edge_slots_per_device,
            "halo_pair_slots": stats.halo_pair_slots,
            "bin_slots": stats.bin_slots,
        }
    halo_parts = [partition_halo(b, 2, binned=True, **slots) for b in shard_batches]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *halo_parts)

    params = model.init(jax.random.PRNGKey(0), shard_batches[0])
    opt = make_optimizer(tc, params)
    step = make_graph_parallel_train_step(model, tc, opt, mesh)
    p_halo, _, loss_halo, n_halo = step(
        jax.tree_util.tree_map(jnp.copy, params),
        opt.init(params),
        stacked,
        jnp.float32(1e-3),
        jax.random.PRNGKey(7),
    )

    loss_fn = make_loss_fn(model, tc)
    losses, counts, grads_acc = [], [], None
    for b in shard_batches:
        l, g = jax.value_and_grad(loss_fn)(params, b, jax.random.PRNGKey(0))
        n = float(np.sum(b.graph_mask))
        losses.append(float(l) * n)
        counts.append(n)
        g = jax.tree_util.tree_map(lambda x: x * n, g)
        grads_acc = g if grads_acc is None else jax.tree_util.tree_map(
            lambda a, c: a + c, grads_acc, g
        )
    n_tot = sum(counts)
    np.testing.assert_allclose(float(loss_halo), sum(losses) / n_tot, rtol=1e-5)
    assert float(n_halo) == n_tot

    import optax

    grads = jax.tree_util.tree_map(lambda g: g / n_tot, grads_acc)
    upd, _ = opt.update(grads, opt.init(params), params)
    upd = jax.tree_util.tree_map(lambda u: u * 1e-3, upd)
    p_ref = optax.apply_updates(params, upd)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_halo), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
