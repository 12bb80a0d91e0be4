"""Graph pooling over padded atom arrays (reference: src/models/pooling.py).

All pooling runs as masked segment reductions keyed by ``atom_mol`` (atom →
graph id; padded atoms carry id B and are scatter-dropped / masked).

Supported types mirror the reference CLI surface: attention / mean / max /
sum (reference: src/main/cli.py:97-99; the reference's Set2Set layer is not
CLI-reachable and is intentionally omitted — documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment_max, segment_mean, segment_softmax, segment_sum
from .layers import Linear

POOLING_TYPES = ("attention", "mean", "max", "sum")


def mean_pool(x, atom_mol, atom_mask, num_graphs):
    x = jnp.where(atom_mask[:, None], x, 0.0)
    return segment_mean(x, jnp.where(atom_mask, atom_mol, num_graphs), num_graphs)


def max_pool(x, atom_mol, atom_mask, num_graphs):
    x = jnp.where(atom_mask[:, None], x, -jnp.inf)
    return segment_max(x, jnp.where(atom_mask, atom_mol, num_graphs), num_graphs)


def sum_pool(x, atom_mol, atom_mask, num_graphs):
    x = jnp.where(atom_mask[:, None], x, 0.0)
    return segment_sum(x, jnp.where(atom_mask, atom_mol, num_graphs), num_graphs)


class MultiHeadAttentionPooling(nn.Module):
    """Multi-head attention pooling
    (reference: src/models/pooling.py:83-172).

    Each head scores atoms with an independent Linear(D, 1); scores are
    divided by a learnable scalar temperature, softmaxed per graph, used for
    a weighted sum per graph, and head outputs are averaged.  Head Linears
    are Xavier-initialized with zero bias (reference: src/models/gnn.py:697-701).
    """

    num_heads: int = 4
    initial_temperature: float = 1.0
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, atom_mol, atom_mask, num_graphs, *, deterministic=True):
        temperature = self.param(
            "temperature",
            lambda key: jnp.asarray(self.initial_temperature, jnp.float32),
        )
        scores = []
        for i in range(self.num_heads):
            s = Linear(1, init="xavier", name=f"attention_weights_{i}")(x)[..., 0]
            scores.append(s / temperature)
        scores = jnp.stack(scores, axis=0)  # (H, A)

        seg_ids = jnp.where(atom_mask, atom_mol, num_graphs)
        attn = segment_softmax(scores, seg_ids, num_graphs, mask=atom_mask)  # (H, A)

        weighted = x[None, :, :] * attn[:, :, None]  # (H, A, D)
        pooled = jax.vmap(lambda w: segment_sum(w, seg_ids, num_graphs))(weighted)
        pooled = pooled.mean(axis=0)  # (B, D)

        if self.dropout_prob > 0:
            pooled = nn.Dropout(self.dropout_prob)(pooled, deterministic=deterministic)
        return pooled, attn
