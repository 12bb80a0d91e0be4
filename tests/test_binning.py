"""Bin-packed dense layout (data/binning.py): equality with the flat path.

The binned layout must be a pure re-indexing: forward outputs, gradients,
and every pooling variant must match the flat segment formulation on the
same molecules (up to matmul-vs-scatter fp reassociation).
"""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.data.binning import BinningError, bin_pack_batch, plan_bins
from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
from aimnet_x2d_tpu.models import GNN, GNNConfig


def _cfg(**kw):
    base = dict(
        hidden_dim=64,
        output_dim=3,
        num_shells=3,
        num_message_passing_layers=2,
        embedding_dim=8,
        ffn_num_layers=2,
        pooling_type="attention",
        task_type="multitask",
        shell_conv_dropout=0.0,
        ffn_dropout=0.0,
    )
    base.update(kw)
    return GNNConfig(**base)


def _mol_order_map(flat, binned):
    """Real-mol slots of each layout, in preserved molecule order."""
    f = np.flatnonzero(np.asarray(flat.graph_mask))
    b = np.flatnonzero(np.asarray(binned.graph_mask))
    assert f.shape == b.shape
    return f, b


@pytest.fixture(scope="module")
def batches():
    flat = make_synthetic_batch(num_graphs=37, mean_atoms=14, num_hops=3, num_tasks=3, seed=5)
    binned = bin_pack_batch(flat, ab=64, mb=16)
    return flat, binned


def test_layout_invariants(batches):
    flat, binned = batches
    nb, ab, _ = binned.bin_adj.shape
    assert binned.num_atom_slots == nb * ab
    assert binned.pool_mat.shape[0] == nb
    # conservation: same real atom/edge/mol counts
    assert binned.atom_mask.sum() == flat.atom_mask.sum()
    assert binned.edge_mask.sum() == flat.edge_mask.sum()
    assert binned.graph_mask.sum() == flat.graph_mask.sum()
    # adjacency total multiplicity == real edge count
    assert int(binned.bin_adj.sum()) == int(flat.edge_mask.sum())
    # every real atom covered exactly once by pool_mat
    cover = np.asarray(binned.pool_mat).sum(axis=1).reshape(-1)
    assert np.array_equal(cover > 0, np.asarray(binned.atom_mask))
    assert cover.max() == 1
    # targets preserved in molecule order
    f, b = _mol_order_map(flat, binned)
    np.testing.assert_array_equal(
        np.asarray(flat.targets)[f], np.asarray(binned.targets)[b]
    )
    # edges stay within one bin and bin-adj matches the edge list
    src = np.asarray(binned.edge_src)[np.asarray(binned.edge_mask)]
    dst = np.asarray(binned.edge_dst)[np.asarray(binned.edge_mask)]
    assert np.array_equal(src // ab, dst // ab)
    rebuilt = np.zeros((nb, ab, ab), np.int32)
    np.add.at(rebuilt, (dst // ab, dst % ab, src % ab), 1)
    np.testing.assert_array_equal(rebuilt, np.asarray(binned.bin_adj).astype(np.int32))


@pytest.mark.parametrize("pooling", ["attention", "mean", "max", "sum"])
def test_forward_equality(batches, pooling):
    flat, binned = batches
    cfg = _cfg(pooling_type=pooling, use_partial_charges=True, use_stereochemistry=True)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), flat)
    out_f = model.apply(params, flat)
    out_b = model.apply(params, binned)
    f, b = _mol_order_map(flat, binned)
    np.testing.assert_allclose(
        np.asarray(out_f.predictions)[f],
        np.asarray(out_b.predictions)[b],
        rtol=2e-4,
        atol=2e-5,
    )
    # atom embeddings at real atoms match (flat order vs binned order)
    fa = np.flatnonzero(np.asarray(flat.atom_mask))
    ba = np.flatnonzero(np.asarray(binned.atom_mask))
    np.testing.assert_allclose(
        np.asarray(out_f.atom_embeddings)[fa],
        np.asarray(out_b.atom_embeddings)[ba],
        rtol=2e-4,
        atol=2e-5,
    )


def test_attention_weights_equality(batches):
    flat, binned = batches
    cfg = _cfg()
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), flat)
    wf = np.asarray(model.apply(params, flat).attention_weights)
    wb = np.asarray(model.apply(params, binned).attention_weights)
    fa = np.flatnonzero(np.asarray(flat.atom_mask))
    ba = np.flatnonzero(np.asarray(binned.atom_mask))
    np.testing.assert_allclose(wf[:, fa], wb[:, ba], rtol=2e-4, atol=1e-6)


def test_gradient_equality(batches):
    flat, binned = batches
    cfg = _cfg()
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), flat)

    def loss(p, batch):
        out = model.apply(p, batch)
        m = batch.graph_mask[:, None]
        err = jnp.where(m, out.predictions - batch.targets, 0.0)
        return jnp.abs(err).sum() / batch.graph_mask.sum()

    gf = jax.grad(loss)(params, flat)
    gb = jax.grad(loss)(params, binned)
    flat_g, _ = jax.flatten_util.ravel_pytree(gf)
    binn_g, _ = jax.flatten_util.ravel_pytree(gb)
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(binn_g), rtol=5e-4, atol=1e-5)


def test_pinned_shapes_across_batches():
    pins = {}
    # warm the pin on the largest-packing batch (loaders grow pins
    # monotonically; a growth event is one bounded recompile)
    for seed in range(4):
        flat = make_synthetic_batch(
            num_graphs=33, mean_atoms=14, num_hops=3, num_tasks=1, seed=seed,
            graph_slots=33,
        )
        bin_pack_batch(flat, ab=64, mb=16, pins=pins)
    shapes = set()
    for seed in range(4):
        flat = make_synthetic_batch(
            num_graphs=33, mean_atoms=14, num_hops=3, num_tasks=1, seed=seed,
            graph_slots=33,
        )
        b = bin_pack_batch(flat, ab=64, mb=16, pins=pins)
        shapes.add(
            (
                b.num_atom_slots,
                b.num_graph_slots,
                b.bin_adj.shape,
                b.pool_mat.shape,
            )
        )
    assert len(shapes) == 1, shapes


def test_oversize_molecule_raises():
    with pytest.raises(BinningError):
        plan_bins(np.array([10, 80, 12]), ab=64, mb=16)


def test_mol_cap_closes_bin():
    sizes = np.full(40, 2)
    bin_of, local, start, nbins = plan_bins(sizes, ab=64, mb=8)
    assert nbins == 5
    assert local.max() == 7


def test_warm_bin_pins_exact():
    """warm_bin_pins seeds the loader-wide worst bin grid up front: no pin
    growth (i.e. no recompile) can occur while iterating a deterministic
    loader, and every batch shares one static (bins, mb) shape."""
    from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_mol

    rng = np.random.default_rng(7)
    sizes = np.clip(rng.poisson(16, 200), 4, 40)
    mols = [make_synthetic_mol(rng, int(s), 3) for s in sizes]
    ds = MoleculeDataset(
        features=mols,
        targets=rng.normal(size=(200, 2)).astype(np.float32),
        smiles=[""] * 200,
        max_hops=3,
    )
    loader = BatchLoader(ds, batch_size=32, binned=True)
    loader.warm_bin_pins()
    seeded = dict(loader._bin_pins)
    shapes = {(b.bin_adj.shape[0], b.pool_mat.shape[1]) for b in loader}
    assert loader._bin_pins == seeded
    assert len(shapes) == 1
    assert shapes.pop() == (seeded["bins"], seeded["mb"])


def test_slim_binned_edges_model_equality(rng, monkeypatch):
    """Slim batches (flat edges dropped) must produce the identical model
    output on the binned path, raise for per-hop (non-parity) models, and
    carry the right static flag."""
    import dataclasses as dc

    monkeypatch.setenv("AIMNET_MP_MEGAKERNEL", "interpret")
    import jax

    from aimnet_x2d_tpu.data.binning import bin_pack_batch, slim_binned_edges
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig

    batch = bin_pack_batch(
        make_synthetic_batch(num_graphs=12, num_hops=2, num_tasks=2, seed=5),
        ab=32,
        mb=8,
    )
    slim = slim_binned_edges(batch)
    assert slim.edges_slim and slim.edge_src.shape == (8,)

    cfg = GNNConfig(
        hidden_dim=32, output_dim=2, num_shells=2,
        num_message_passing_layers=2, embedding_dim=8,
        pooling_type="attention", task_type="multitask",
        shell_conv_dropout=0.0, ffn_dropout=0.0,
    )
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    full = model.apply(params, batch, deterministic=True).predictions
    thin = model.apply(params, slim, deterministic=True).predictions
    np.testing.assert_array_equal(np.asarray(full), np.asarray(thin))

    hop_model = GNN(dc.replace(cfg, parity_mode=False))
    with pytest.raises(ValueError, match="slim"):
        hop_model.init(jax.random.PRNGKey(0), slim)


def test_plan_bin_counts_matches_plan_bins():
    """plan_bin_counts is the O(bins·log B) twin of plan_bins — identical
    (num_bins, worst-bin molecule count) on fuzzed size mixes."""
    from aimnet_x2d_tpu.data.binning import plan_bin_counts

    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(0, 400))
        sizes = rng.integers(1, 65, size=n)
        ab = int(rng.integers(64, 257))
        mb = int(rng.integers(1, 49))
        _, local, _, nb = plan_bins(sizes, ab=ab, mb=mb)
        nb2, mx2 = plan_bin_counts(sizes, ab, mb)
        assert nb2 == nb
        assert mx2 == (int(local.max()) + 1 if local.size else 1)
