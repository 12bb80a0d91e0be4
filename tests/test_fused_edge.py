"""Fused gather+segment-sum kernel (ops/fused_edge.py): layout invariants,
kernel-vs-XLA equality (interpreter backend on CPU), custom-vjp gradients,
and the full model forward/backward with layouts attached."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.data.batching import attach_fused_layouts, collate
from aimnet_x2d_tpu.models import GNN, GNNConfig
from aimnet_x2d_tpu.ops.fused_edge import (
    build_layout,
    build_layouts,
    fused_edge_aggregate,
)

from test_model import _random_mol


def _rand_edges(rng, A, E):
    src = rng.integers(0, A, E).astype(np.int32)
    dst = rng.integers(0, A, E).astype(np.int32)
    mask = rng.random(E) < 0.9
    return src, dst, mask


def _xla_ref(x, src, dst, mask, A):
    return jax.ops.segment_sum(
        jnp.where(jnp.asarray(mask)[:, None], x[jnp.asarray(src)], 0.0),
        jnp.asarray(np.where(mask, dst, A)),
        num_segments=A,
    )


def test_layout_invariants(rng):
    A, E = 640, 900
    src, dst, mask = _rand_edges(rng, A, E)
    lay = build_layout(src, dst, mask, A, window=128, chunk=128)
    W = lay.num_windows
    assert W == 5
    sl = np.asarray(lay.src_local).reshape(W, -1)
    sg = np.asarray(lay.seg_local).reshape(W, -1)
    base = np.asarray(lay.base)
    # every real edge appears exactly once, with correct localization
    seen = []
    for w in range(W):
        real = sg[w] < lay.window
        assert np.all(sl[w][real] < lay.sb)
        assert np.all(sl[w][~real] == lay.sb)
        for s, g in zip(sl[w][real], sg[w][real]):
            seen.append((int(base[w] + s), int(w * lay.window + g)))
    expect = sorted(zip(src[mask].tolist(), dst[mask].tolist()))
    assert sorted(seen) == expect


def test_fused_matches_xla_and_grad(rng):
    A, E, D = 640, 900, 48
    src, dst, mask = _rand_edges(rng, A, E)
    fwd, bwd = build_layouts(src, dst, mask, A, window=128, chunk=128)
    x = jnp.asarray(rng.normal(size=(A, D)).astype(np.float32))

    ref = _xla_ref(x, src, dst, mask, A)
    out = fused_edge_aggregate(x, fwd, bwd, exact=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.normal(size=(A, D)).astype(np.float32))
    gr = jax.grad(lambda y: jnp.sum(_xla_ref(y, src, dst, mask, A) * g))(x)
    gf = jax.grad(
        lambda y: jnp.sum(fused_edge_aggregate(y, fwd, bwd, exact=True, interpret=True) * g)
    )(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-5)


def test_pinned_shapes_shared(rng):
    """cap/sb minimums produce identical static shapes across batches."""
    A = 640
    pins = {}
    shapes = set()
    for i in range(3):
        src, dst, mask = _rand_edges(rng, A, 600 + 200 * i)
        mols = None
        batch = collate(
            [_random_mol(rng, n_atoms=9, num_hops=2) for _ in range(32)],
            rng.normal(size=(32, 1)).astype(np.float32),
            num_hops=2,
            atom_slots=A,
            edge_slots=2048,
        )
        batch = attach_fused_layouts(batch, pins)
        assert batch.fused_fwd is not None
        shapes.add(
            (batch.fused_fwd.src_local.shape, batch.fused_fwd.sb,
             batch.fused_bwd.src_local.shape, batch.fused_bwd.sb)
        )
    assert len(shapes) == 1


def test_model_forward_and_train_step_with_fused(rng):
    """Full GNN forward + grad with fused layouts == the XLA path."""
    cfg = GNNConfig(
        hidden_dim=32, output_dim=2, num_shells=2, num_message_passing_layers=2,
        embedding_dim=8, ffn_num_layers=2, pooling_type="attention",
        task_type="multitask", shell_conv_dropout=0.0, ffn_dropout=0.0,
    )
    mols = [_random_mol(rng, n_atoms=int(rng.integers(6, 10)), num_hops=2) for _ in range(24)]
    targets = rng.normal(size=(24, 2)).astype(np.float32)
    # atom_slots must admit a 128-multiple source block (≤ atom_slots)
    batch = collate(mols, targets, num_hops=2, atom_slots=256)
    fused = attach_fused_layouts(batch)
    assert fused.fused_fwd is not None, "batch too small for a source block?"

    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch, deterministic=True).predictions
    out = model.apply(params, fused, deterministic=True).predictions
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def loss(p, b):
        pred = model.apply(p, b, deterministic=True).predictions
        return jnp.mean((pred - jnp.asarray(targets)) ** 2, where=jnp.asarray(batch.graph_mask)[:, None])

    g_ref = jax.grad(loss)(params, batch)
    g_fused = jax.grad(loss)(params, fused)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5)


def test_tiny_batch_falls_back(rng):
    mols = [_random_mol(rng, n_atoms=5, num_hops=2) for _ in range(2)]
    batch = collate(mols, rng.normal(size=(2, 1)).astype(np.float32), num_hops=2)
    out = attach_fused_layouts(batch)  # atom slots < min source block
    assert out.fused_fwd is None
