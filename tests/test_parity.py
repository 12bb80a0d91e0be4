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


def test_full_forward_parity(rng):
    """The COMPLETE forward as one composition — embeddings → split → MP
    (charge-eq + stereo on) → attention pooling → FFN → evidential head —
    against the oracle on injected weights (VERDICT r1 weak #6: layer
    tests alone can miss wiring drift between layers)."""
    cfg = GNNConfig(
        hidden_dim=40, output_dim=3, num_shells=2, num_message_passing_layers=2,
        embedding_dim=8, ffn_num_layers=3, pooling_type="attention",
        task_type="multitask", use_partial_charges=True, use_stereochemistry=True,
        shell_conv_dropout=0.0, ffn_dropout=0.0, loss_function="evidential",
    )
    batch = _make_batch(rng, n_mols=5, num_hops=2, n_tasks=3, with_stereo=True)
    model = GNN(cfg)
    params = model.init(jax.random.PRNGKey(3), batch)
    out = model.apply(params, batch, deterministic=True)

    am = np.asarray(batch.atom_mask)
    em = np.asarray(batch.edge_mask)
    gm = np.asarray(batch.graph_mask)
    arrays = dict(
        atom_type=np.asarray(batch.atom_type)[am],
        hydrogen_count=np.asarray(batch.hydrogen_count)[am],
        degree=np.asarray(batch.degree)[am],
        hybridization=np.asarray(batch.hybridization)[am],
        batch_indices=np.asarray(batch.atom_mol)[am],
        edge_dst=np.asarray(batch.edge_dst)[em],
        edge_src=np.asarray(batch.edge_src)[em],
        tet_nbrs=np.asarray(batch.tet_nbrs)[np.asarray(batch.tet_mask)],
        cis_pairs=np.asarray(batch.cis_pairs)[np.asarray(batch.cis_mask)],
        trans_pairs=np.asarray(batch.trans_pairs)[np.asarray(batch.trans_mask)],
        total_charges=np.asarray(batch.total_charge)[gm],
        num_graphs=int(gm.sum()),
    )
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    preds_t, atom_t, mol_t = oracle.full_forward_oracle(p, cfg, arrays)

    np.testing.assert_allclose(
        np.asarray(out.atom_embeddings)[am], atom_t, rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.mol_embeddings)[gm], mol_t, rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.predictions)[gm], preds_t, rtol=5e-4, atol=5e-5
    )
    assert out.predictions.shape[-1] == 4 * 3  # evidential head width


def test_param_name_shape_map(rng):
    """Parameter name/shape map parity with the reference architecture
    (SURVEY §2b #22), including the dead Q5 params kept for checkpoint
    parity.  Fails if any layer's wiring or sizing drifts."""
    H, E, K, T = 40, 8, 2, 3
    cfg = GNNConfig(
        hidden_dim=H, output_dim=T, num_shells=K, num_message_passing_layers=2,
        embedding_dim=E, ffn_num_layers=3, pooling_type="attention",
        task_type="multitask", use_partial_charges=True, use_stereochemistry=True,
        loss_function="evidential", parity_params=True,
    )
    batch = _make_batch(rng, n_mols=4, num_hops=K, n_tasks=T, with_stereo=True)
    params = GNN(cfg).init(jax.random.PRNGKey(0), batch)["params"]

    got = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        got[name] = tuple(leaf.shape)

    D = cfg.x_other_dim  # int(0.3*H) = 12
    F = cfg.ffn_dim  # = H
    expected = {
        "atom_type_embedding": (119, E),
        "hydrogen_count_embedding": (9, E),
        "degree_embedding": (7, E),
        "hybridization_embedding": (7, E),
        "embedding_projection/kernel": (4 * E, H),
        "embedding_projection/bias": (H,),
        # dead params (reference gnn.py:146,194 — quirk Q5)
        "long_range_projection/kernel": (H, F),
        "long_range_projection/bias": (F,),
        "stereochemical_embedding/kernel": (3 * H, H),
        "stereochemical_embedding/bias": (H,),
        "stereochemical_embedding_2/kernel": (3 * D, D),
        "stereochemical_embedding_2/bias": (D,),
        "concat_self_other/kernel": (H, H),
        "concat_self_other/bias": (H,),
        "pooling/temperature": (),
        "post_pooling_projection/kernel": (H, F),
        "post_pooling_projection/bias": (F,),
        "skip_transform/kernel": (F, F),
        "skip_transform/bias": (F,),
        "output_layer/kernel": (2 * F, 4 * T),  # evidential: 4 heads/task
        "output_layer/bias": (4 * T,),
    }
    for l in range(2):
        mp = f"message_passing_layers_{l}"
        expected[f"{mp}/input_proj_kernel"] = ((K + 1) * D, D)
        expected[f"{mp}/input_proj_bias"] = (D,)
        expected[f"{mp}/global_skip_proj_kernel"] = ((K + 1) * D, D)
        expected[f"{mp}/global_skip_proj_bias"] = (D,)
        for m in range(cfg.shell_conv_num_mlp_layers):
            for j in (1, 2):
                expected[f"{mp}/mlp_{m}_linear_{j}/kernel"] = (D, D)
                expected[f"{mp}/mlp_{m}_linear_{j}/bias"] = (D,)
    for h in range(cfg.attention_num_heads):
        expected[f"pooling/attention_weights_{h}/kernel"] = (H, 1)
        expected[f"pooling/attention_weights_{h}/bias"] = (1,)
    for b in range(cfg.ffn_num_layers):
        for j in (1, 2):
            expected[f"ffn/block_{b}/linear{j}/kernel"] = (F, F)
            expected[f"ffn/block_{b}/linear{j}/bias"] = (F,)

    assert got == expected
