"""Independent torch oracle of the reference model math.

Implements the computation the reference performs (as documented in
SURVEY.md §3.2 and cited reference lines) directly in plain torch —
scatter ops via ``index_add_`` instead of torch_scatter — to validate
per-layer activation parity of the JAX model (BASELINE.md: "per-layer
activations ... allclose").  This is an oracle written from the math, not
a copy of the reference sources.

Weights are injected from the JAX param pytree (flax kernels are (in, out)
= torch weight.T).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.tensor(np.asarray(x, np.float32))


def _linear(x, params):  # params: {"kernel": (in,out), "bias": (out,)}
    return x @ _t(params["kernel"]) + _t(params["bias"])


def shell_conv_oracle(params, x, target, src, num_hops, num_mlp_layers):
    """Reference ShellConvolutionLayer.forward semantics
    (src/models/layers.py:63-167) with the Q1 hop-collapse: all edges
    scatter into hop-chunk 0 of a (K*N, D) buffer."""
    x = _t(x)
    N, D = x.shape
    target = torch.tensor(np.asarray(target), dtype=torch.long)
    src = torch.tensor(np.asarray(src), dtype=torch.long)

    aggregated = torch.zeros(num_hops * N, D)
    true_src = src % N
    aggregated.index_add_(0, target, x[true_src])
    chunks = torch.split(aggregated, N, dim=0)

    inp = torch.cat([x, *chunks], dim=-1)
    h = F.silu(_linear(inp, {"kernel": params["input_proj_kernel"],
                             "bias": params["input_proj_bias"]}))
    global_skip = _linear(inp, {"kernel": params["global_skip_proj_kernel"],
                                "bias": params["global_skip_proj_bias"]})
    for i in range(num_mlp_layers):
        skip = h
        h = _linear(h, params[f"mlp_{i}_linear_1"])
        h = F.silu(h)
        h = _linear(h, params[f"mlp_{i}_linear_2"])
        h = h + skip
    return (h + global_skip).numpy()


def attention_pool_oracle(params, x, batch_indices, num_graphs, num_heads):
    """Reference MultiHeadAttentionPoolingLayer.forward
    (src/models/pooling.py:122-172): per-head Linear(D,1)/temperature,
    per-graph softmax, weighted sum, mean over heads."""
    x = _t(x)
    bi = torch.tensor(np.asarray(batch_indices), dtype=torch.long)
    temp = float(np.asarray(params["temperature"]))
    pooled_heads = []
    attn_all = []
    for hidx in range(num_heads):
        p = params[f"attention_weights_{hidx}"]
        scores = (_linear(x, p)).squeeze(-1) / temp
        attn = torch.zeros_like(scores)
        for g in range(num_graphs):
            sel = bi == g
            if sel.any():
                attn[sel] = torch.softmax(scores[sel], dim=0)
        weighted = x * attn.unsqueeze(-1)
        pooled = torch.zeros(num_graphs, x.shape[1])
        pooled.index_add_(0, bi, weighted)
        pooled_heads.append(pooled)
        attn_all.append(attn)
    return torch.stack(pooled_heads).mean(0).numpy(), torch.stack(attn_all).numpy()


def charge_equilibration_oracle(x, batch_indices, total_charges, num_graphs):
    """Reference _partial_charge_calculation (src/models/gnn.py:622-658)."""
    x = _t(x)
    bi = torch.tensor(np.asarray(batch_indices), dtype=torch.long)
    tc = _t(total_charges)
    q, f, rest = x[:, :1], x[:, 1:2], x[:, 2:]
    f = torch.clamp(f, min=1e-6)
    Q = torch.zeros(num_graphs, 1)
    Q.index_add_(0, bi, q)
    Fu = torch.zeros(num_graphs, 1)
    Fu.index_add_(0, bi, f)
    Fu = torch.clamp(Fu + 1e-6, min=1e-6)
    dQ = tc.unsqueeze(-1) - Q
    f_new = f / Fu[bi]
    q_new = q + f_new * dQ[bi]
    return torch.cat([q_new, f_new, rest], dim=-1).numpy()


def cis_trans_oracle(x, cis_pairs, trans_pairs):
    """Reference _cis_trans_calculation (src/models/gnn.py:465-509)."""
    x = _t(x)
    out = x.clone()
    for s, d in np.asarray(cis_pairs):
        out[d] -= x[s]
    for s, d in np.asarray(trans_pairs):
        out[d] += x[s]
    return out.numpy()


def tetrahedral_oracle(x, tet_nbrs):
    """Reference _tetrahedral_feature_calculation_physics_inspired
    (src/models/gnn.py:387-462)."""
    x = _t(x)
    tet = torch.tensor(np.asarray(tet_nbrs), dtype=torch.long)
    if tet.numel() == 0:
        return x.numpy()
    updated = x.clone()
    emb_raw = updated[tet]  # (M, 4, D)
    mags = torch.norm(emb_raw, dim=-1, keepdim=True)
    emb = F.normalize(emb_raw, dim=-1, eps=1e-8)
    sq = emb**2
    s1, s2, s3 = (torch.roll(sq, -k, dims=1) for k in (1, 2, 3))
    e1, e2, e3 = (torch.roll(emb, -k, dims=1) for k in (1, 2, 3))
    chir = s1 * (e2 - e3) + s2 * (e3 - e1) + s3 * (e1 - e2)
    chir = chir * torch.tanh(mags.mean(dim=1, keepdim=True) / 3.0)
    idx = tet.reshape(-1)
    updated.index_add_(0, idx, chir.reshape(-1, x.shape[1]))
    mask = torch.zeros(x.shape[0], dtype=torch.bool)
    mask[torch.unique(idx)] = True
    updated[~mask] = 0.0
    return updated.numpy()


def mlp_oracle(params, x, num_layers):
    """Reference MultiLayerPerceptron (src/models/layers.py:222-267):
    LinearBlock stack — skip only on middle blocks (input==output dim)."""
    x = _t(np.asarray(x, np.float32)) if not torch.is_tensor(x) else x

    def block(p, v, use_skip):
        out = _linear(v, p["linear1"])
        out = F.silu(out)
        out = _linear(out, p["linear2"])
        if use_skip and v.shape[-1] == out.shape[-1]:
            out = out + v
        return out

    if num_layers == 1:
        return block(params["block_0"], x, False)
    x = block(params["block_0"], x, False)
    for i in range(num_layers - 2):
        x = block(params[f"block_{i + 1}"], x, True)
    return block(params[f"block_{num_layers - 1}"], x, False)


def full_forward_oracle(params, cfg, arrays):
    """The COMPLETE reference forward (src/models/gnn.py:197-260, SURVEY
    §3.2) composed from the per-layer oracles, on unpadded arrays:

    embeddings → projection → split (Q2) → L × [charge-eq (Q3) → stereo
    (Q6/Q7) → shell conv (Q1) → residual] → concat_self_other → attention
    pooling → post-pool projection → FFN → skip concat → output layer.

    ``params``: numpy-ified flax params["params"]; ``cfg``: GNNConfig;
    ``arrays``: dict of unpadded numpy inputs.  Returns (predictions,
    atom_embeddings, mol_embeddings).
    """
    at, hc, dg, hb = (
        arrays["atom_type"], arrays["hydrogen_count"],
        arrays["degree"], arrays["hybridization"],
    )
    embs = [
        _t(params["atom_type_embedding"])[torch.tensor(at, dtype=torch.long)],
        _t(params["hydrogen_count_embedding"])[torch.tensor(hc, dtype=torch.long)],
        _t(params["degree_embedding"])[torch.tensor(dg, dtype=torch.long)],
        _t(params["hybridization_embedding"])[torch.tensor(hb, dtype=torch.long)],
    ]
    x = torch.cat(embs, dim=-1)
    x = F.silu(_linear(x, params["embedding_projection"]))
    x_self, x_other = x[:, : cfg.x_self_dim], x[:, cfg.x_self_dim :]
    x_other = x_other.contiguous().numpy()

    for l in range(cfg.num_message_passing_layers):
        if cfg.use_partial_charges:
            x_other = charge_equilibration_oracle(
                x_other, arrays["batch_indices"], arrays["total_charges"],
                int(arrays["num_graphs"]),
            )
        if cfg.use_stereochemistry:
            ct = cis_trans_oracle(x_other, arrays["cis_pairs"], arrays["trans_pairs"])
            tt = tetrahedral_oracle(x_other, arrays["tet_nbrs"])
            cat = np.concatenate([x_other, ct, tt], axis=-1)
            x_other = (
                _linear(_t(cat), params["stereochemical_embedding_2"]).numpy()
            )
        conv = shell_conv_oracle(
            params[f"message_passing_layers_{l}"],
            x_other,
            arrays["edge_dst"],
            arrays["edge_src"],
            cfg.num_shells,
            cfg.shell_conv_num_mlp_layers,
        )
        x_other = conv + x_other

    combined = torch.cat([x_self, _t(x_other)], dim=-1)
    atom_embeddings = _linear(combined, params["concat_self_other"])

    pooled, _ = attention_pool_oracle(
        params["pooling"],
        atom_embeddings.numpy(),
        arrays["batch_indices"],
        int(arrays["num_graphs"]),
        cfg.attention_num_heads,
    )

    h = _linear(_t(pooled), params["post_pooling_projection"])
    h = mlp_oracle(params["ffn"], h, cfg.ffn_num_layers)
    skip = _linear(h, params["skip_transform"])
    final = torch.cat([h, skip], dim=-1)
    preds = _linear(final, params["output_layer"])
    return preds.numpy(), atom_embeddings.numpy(), pooled


def evidential_loss_oracle(outputs, targets, lambda_reg=1.0):
    """Reference EvidentialLoss.forward (src/models/losses.py:108-167)."""
    o = _t(outputs)
    t = _t(targets)
    B, T = t.shape
    o = o.view(B, T, 4)
    gamma = o[:, :, 0]
    nu = F.softplus(o[:, :, 1]) + 1.0
    alpha = F.softplus(o[:, :, 2]) + 1.0
    beta = F.softplus(o[:, :, 3])
    diff = t - gamma
    nll = (
        0.5 * torch.log(torch.pi / nu)
        - alpha * torch.log(2 * beta)
        + torch.lgamma(alpha)
        - torch.lgamma(alpha + 0.5)
        + (alpha + 0.5) * torch.log(beta + nu * diff**2 / 2)
    )
    return float((nll + lambda_reg * (2 * beta + alpha)).mean())
