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
