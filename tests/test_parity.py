"""Per-layer activation parity: JAX layers vs the independent torch oracle
(BASELINE.md parity requirement)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_oracle as oracle
from aimnet_x2d_tpu.data.batching import MolBatch
from aimnet_x2d_tpu.models import GNN, GNNConfig, ShellConvolutionLayer
from aimnet_x2d_tpu.models.losses import create_loss_function
from aimnet_x2d_tpu.models.pooling import MultiHeadAttentionPooling

from test_model import _make_batch


def test_shell_conv_parity(rng):
    """JAX shell conv (padded, parity mode) == torch oracle (unpadded,
    Q1 hop-collapse semantics) on identical weights and edges."""
    N, D, K, M = 10, 12, 3, 2
    x = rng.normal(size=(N, D)).astype(np.float32)
    # random symmetric edge set across hops (flattened union, Q1)
    pairs = [(i, j) for i in range(N) for j in range(N) if i != j and rng.random() < 0.3]
    dst = np.array([p[0] for p in pairs], np.int32)
    src = np.array([p[1] for p in pairs], np.int32)

    layer = ShellConvolutionLayer(dim=D, num_hops=K, num_mlp_layers=M, dropout=0.0)
    E = len(pairs)
    params = layer.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x),
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.ones(E, jnp.int32),
        jnp.ones(E, bool),
    )
    out_jax = layer.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.ones(E, jnp.int32),
        jnp.ones(E, bool),
    )

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    flat = {}
    for k, v in p.items():
        if isinstance(v, dict):
            flat[k] = v
        else:
            flat[k] = v
    out_torch = oracle.shell_conv_oracle(flat, x, dst, src, K, M)
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=2e-5, atol=2e-5)


def test_attention_pooling_parity(rng):
    N, D, B, H = 14, 16, 3, 4
    x = rng.normal(size=(N, D)).astype(np.float32)
    bi = np.sort(rng.integers(0, B, N)).astype(np.int32)

    pool = MultiHeadAttentionPooling(num_heads=H, initial_temperature=1.3)
    params = pool.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(bi), jnp.ones(N, bool), B
    )
    pooled_jax, attn_jax = pool.apply(
        params, jnp.asarray(x), jnp.asarray(bi), jnp.ones(N, bool), B
    )

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    pooled_t, attn_t = oracle.attention_pool_oracle(p, x, bi, B, H)
    np.testing.assert_allclose(np.asarray(pooled_jax), pooled_t, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn_jax), attn_t, rtol=2e-5, atol=2e-5)


def test_charge_equilibration_parity(rng):
    B, N, D = 3, 12, 8
    x = rng.normal(size=(N, D)).astype(np.float32)
    bi = np.sort(rng.integers(0, B, N)).astype(np.int32)
    tc = rng.integers(-1, 2, B).astype(np.float32)

    batch_stub = MolBatch(
        atom_type=np.zeros(N, np.int32), hydrogen_count=np.zeros(N, np.int32),
        degree=np.zeros(N, np.int32), hybridization=np.zeros(N, np.int32),
        atom_mol=bi, atom_mask=np.ones(N, bool),
        edge_src=np.zeros(1, np.int32), edge_dst=np.zeros(1, np.int32),
        edge_hop=np.zeros(1, np.int32), edge_mask=np.zeros(1, bool),
        total_charge=tc, targets=np.zeros((B, 1), np.float32),
        graph_mask=np.ones(B, bool),
        tet_nbrs=np.zeros((1, 4), np.int32), tet_mask=np.zeros(1, bool),
        cis_pairs=np.zeros((1, 2), np.int32), cis_mask=np.zeros(1, bool),
        trans_pairs=np.zeros((1, 2), np.int32), trans_mask=np.zeros(1, bool),
    )
    cfg = GNNConfig(hidden_dim=27, output_dim=1, use_partial_charges=True)
    model = GNN(cfg)
    # bind with dummy params; the helper is parameter-free
    dummy = _make_dummy_params(model, batch_stub)
    eq = model.bind(dummy)._charge_equilibration(batch_stub, jnp.asarray(x), B)
    expected = oracle.charge_equilibration_oracle(x, bi, tc, B)
    np.testing.assert_allclose(np.asarray(eq), expected, rtol=1e-5, atol=1e-6)


def _make_dummy_params(model, batch):
    return model.init(jax.random.PRNGKey(0), batch)


def test_cis_trans_parity(rng):
    N, D = 10, 6
    x = rng.normal(size=(N, D)).astype(np.float32)
    cis = np.array([[0, 3], [3, 0], [2, 5]], np.int32)
    trans = np.array([[1, 4], [4, 1]], np.int32)

    batch = _make_batch(rng, with_stereo=False)
    cfg = GNNConfig(hidden_dim=20, output_dim=2, use_stereochemistry=True)
    model = GNN(cfg)
    import dataclasses as dc

    P = batch.cis_pairs.shape[0]
    b2 = dc.replace(
        batch,
        cis_pairs=np.vstack([cis, np.full((P - 3, 2), batch.num_atom_slots)]).astype(np.int32),
        cis_mask=np.arange(P) < 3,
        trans_pairs=np.vstack([trans, np.full((P - 2, 2), batch.num_atom_slots)]).astype(np.int32),
        trans_mask=np.arange(P) < 2,
    )
    params = model.init(jax.random.PRNGKey(0), b2)
    A = b2.num_atom_slots
    xx = np.zeros((A, D), np.float32)
    xx[:N] = x
    got = model.bind(params)._cis_trans_features(b2, jnp.asarray(xx), A)
    expected = oracle.cis_trans_oracle(x, cis, trans)
    np.testing.assert_allclose(np.asarray(got)[:N], expected, rtol=1e-5, atol=1e-6)


def test_tetrahedral_parity(rng):
    N, D = 12, 9
    x = rng.normal(size=(N, D)).astype(np.float32)
    tet = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], np.int32)

    batch = _make_batch(rng, with_stereo=False)
    cfg = GNNConfig(hidden_dim=30, output_dim=2, use_stereochemistry=True)
    model = GNN(cfg)
    import dataclasses as dc

    C = batch.tet_nbrs.shape[0]
    b2 = dc.replace(
        batch,
        tet_nbrs=np.vstack([tet, np.full((C - 2, 4), batch.num_atom_slots)]).astype(np.int32),
        tet_mask=np.arange(C) < 2,
    )
    params = model.init(jax.random.PRNGKey(0), b2)
    A = b2.num_atom_slots
    xx = np.zeros((A, D), np.float32)
    xx[:N] = x
    got = model.bind(params)._tetrahedral_features(b2, jnp.asarray(xx), A)
    expected = oracle.tetrahedral_oracle(x, tet)
    np.testing.assert_allclose(np.asarray(got)[:N], expected, rtol=1e-4, atol=1e-5)


def test_evidential_loss_parity(rng):
    B, T = 8, 3
    raw = rng.normal(size=(B, 4 * T)).astype(np.float32)
    tgt = rng.normal(size=(B, T)).astype(np.float32)
    loss_jax = float(
        create_loss_function("evidential")(jnp.asarray(raw), jnp.asarray(tgt), jnp.ones(B, bool))
    )
    loss_torch = oracle.evidential_loss_oracle(raw, tgt)
    assert abs(loss_jax - loss_torch) < 1e-4
