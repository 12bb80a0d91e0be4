"""Segment reductions — the core sparse primitive of the framework.

The reference framework leans on torch_scatter CUDA kernels
(reference: src/models/layers.py:158-163, src/models/pooling.py:33-241) for
edge aggregation and graph pooling over ragged batches.  On TPU we instead
work with *fixed-shape padded batches* and express every ragged reduction as
a segment reduction keyed by an int32 segment-id vector:

- edge aggregation:   segment_sum(src_features[edge], edge_dst, num_atoms)
- graph pooling:      segment_{sum,mean,max}(atom_features, atom_mol, B)
- attention pooling:  segment_softmax(scores, atom_mol, B)

Padding convention: padded entries carry a segment id equal to
``num_segments`` (one past the end).  XLA scatter drops out-of-range indices
under jit, so padded rows vanish without masking arithmetic.  Callers that
cannot guarantee this use the explicit ``mask`` arguments.

These are the XLA reference implementations; drop-in Pallas TPU kernels live
in :mod:`aimnet_x2d_tpu.ops.pallas_segment` and are selected by
``use_pallas=True`` at the model level once validated against these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum of ``data`` rows per segment. Out-of-range ids are dropped."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean of ``data`` rows per segment (empty segments give 0).

    Matches torch_scatter.scatter_mean semantics used for mean pooling
    (reference: src/models/pooling.py:33).
    """
    totals = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    counts = segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return totals / jnp.maximum(counts, 1.0)[..., None] if data.ndim > 1 else (
        totals / jnp.maximum(counts, 1.0)
    )


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
    empty_value: float = 0.0,
) -> jax.Array:
    """Max of ``data`` rows per segment.

    Empty segments yield ``empty_value`` (torch_scatter fills untouched output
    rows with zeros; reference: src/models/pooling.py:56).
    """
    out = jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(jnp.isneginf(out), jnp.asarray(empty_value, out.dtype), out)


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Softmax over entries sharing a segment id, along the last axis = rows.

    ``scores`` has shape [..., N]; ``segment_ids`` has shape [N] and indexes
    the last axis.  Used by attention pooling
    (reference: src/models/pooling.py:145 — torch_scatter.scatter_softmax).

    ``mask`` (bool [N]) marks valid rows; padded rows get probability 0.
    """
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)

    # Per-segment max for numerical stability.
    def _seg_max_last(s):
        m = jax.ops.segment_max(
            s,
            segment_ids,
            num_segments=num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        # Empty segments give -inf; make them finite so exp() below is well
        # defined (the corresponding entries don't exist anyway).
        m = jnp.where(jnp.isneginf(m), 0.0, m)
        return m[segment_ids]

    if scores.ndim == 1:
        shifted = scores - _seg_max_last(scores)
    else:
        # Apply along last axis for each leading index via vmap.
        lead = scores.shape[:-1]
        flat = scores.reshape((-1, scores.shape[-1]))
        maxes = jax.vmap(_seg_max_last)(flat)
        shifted = (flat - maxes).reshape(lead + (scores.shape[-1],))

    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(mask, expd, 0.0)

    def _seg_sum_last(e):
        s = jax.ops.segment_sum(
            e,
            segment_ids,
            num_segments=num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        return s[segment_ids]

    if scores.ndim == 1:
        denom = _seg_sum_last(expd)
    else:
        flat = expd.reshape((-1, expd.shape[-1]))
        denom = jax.vmap(_seg_sum_last)(flat).reshape(expd.shape)

    return expd / jnp.maximum(denom, 1e-16)
