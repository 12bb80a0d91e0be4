"""Multi-feature embedding lookup as one block-diagonal MXU matmul.

XLA lowers ``table[ids]`` gathers (and their scatter-add backwards) to
row-serial HBM traffic — measured ~1.5 ms forward + ~4.5 ms backward per
train step across the four feature tables for the flagship batch
(BASELINE.md round 2), independent of table size.  Both directions are
replaced here by dense matmuls that the MXU executes in ~0.2 ms.

Reference counterpart: four ``nn.Embedding`` lookups concatenated
(reference src/models/gnn.py:262-274); semantics are identical, with table
values rounded to the compute dtype exactly where bf16 mode rounds them
anyway (the projection that consumes them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_rows(codes, vocab_sizes, dt):
    """Concat one-hot (ΣV, L) from stacked code rows (F, L) int32 — the
    in-kernel (Mosaic-safe: iota + compares, no gathers) twin of the
    onehot_t concat below.  A code outside its block's [0, V_f) range
    lights no row (zero embedding), exactly like ``id == arange(V)``
    outside the range.  Shared by the Pallas kernels that fold the
    embedding lookup in-kernel (ops/bin_attnpool.py, ops/bin_mp.py)."""
    V = int(sum(vocab_sizes))
    L = codes.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (V, L), 0)
    oh = None
    off = 0
    for f, v in enumerate(vocab_sizes):
        cf = jax.lax.slice_in_dim(codes, f, f + 1, axis=0)  # (1, L)
        m = (row >= off) & (row < off + v) & ((row - off) == cf)
        oh = m if oh is None else (oh | m)
        off += int(v)
    return oh.astype(dt)


def blockdiag_table_t(tables):
    """Stack fp32 embedding tables into the transposed block-diagonal
    (ΣD, ΣV) master used by the in-kernel embedding fold — plain
    differentiable jnp (pad/concat/transpose), so table gradients flow
    back through XLA from the kernel's d_blockdiag output."""
    D = sum(int(t.shape[1]) for t in tables)
    rows, c0 = [], 0
    for t in tables:
        d = int(t.shape[1])
        rows.append(jnp.pad(t, ((0, 0), (c0, D - c0 - d))))
        c0 += d
    return jnp.concatenate(rows, axis=0).T  # (ΣD, ΣV)


def embed_concat_onehot(tables, ids, dtype=jnp.bfloat16):
    """Concatenated multi-feature embedding as ONE block-diagonal matmul.

    ``concat([T_i[ids_i] for i])`` re-reads the atom axis once per feature
    (4 gathers + their scatter/matmul backwards).  Since the one-hot rows of
    all features can be concatenated, the whole lookup is
    ``onehot_cat (A, ΣV) @ blockdiag(T_1..T_n) (ΣV, ΣD)`` — a single MXU
    matmul whose backward is also a single matmul; XLA autodiff slices the
    block-diagonal gradient back to the per-table params.  Pure jnp ops:
    safe under jit, grad, and shard_map.

    Intended for bf16 compute (0/1 one-hots are exact; table values round
    to bf16 like every other bf16-mode operand).
    """
    Vs = [int(t.shape[0]) for t in tables]
    Ds = [int(t.shape[1]) for t in tables]
    D = sum(Ds)
    rows = []
    c0 = 0
    for t, d in zip(tables, Ds):
        rows.append(jnp.pad(t.astype(dtype), ((0, 0), (c0, D - c0 - d))))
        c0 += d
    blockdiag = jnp.concatenate(rows, axis=0)  # (ΣV, ΣD)

    onehot = jnp.concatenate(
        [
            (i[:, None] == jnp.arange(v, dtype=i.dtype)[None, :]).astype(dtype)
            for i, v in zip(ids, Vs)
        ],
        axis=1,
    )  # (A, ΣV): one 1 per feature block
    return jnp.dot(onehot, blockdiag, preferred_element_type=jnp.float32).astype(dtype)


def embed_concat_onehot_t(tables, ids, dtype=jnp.bfloat16):
    """Feature-major twin of :func:`embed_concat_onehot`: returns (ΣD, A).

    ``blockdiagᵀ (ΣD, ΣV) @ onehotᵀ (ΣV, A)`` — the whole embedding lookup
    lands directly in the feature-major layout the binned fast path keeps
    end-to-end (models/gnn.py), so no (A, ΣD) array or transpose exists.
    In fp32 the one-hot matmul is exactly the gather (sums of exact 0/1
    products); in bf16 the table values round where bf16 mode rounds them
    anyway.
    """
    Vs = [int(t.shape[0]) for t in tables]
    Ds = [int(t.shape[1]) for t in tables]
    D = sum(Ds)
    rows = []
    c0 = 0
    for t, d in zip(tables, Ds):
        rows.append(jnp.pad(t.astype(dtype), ((0, 0), (c0, D - c0 - d))))
        c0 += d
    blockdiag_t = jnp.concatenate(rows, axis=0).T  # (ΣD, ΣV)
    onehot_t = jnp.concatenate(
        [
            (i[None, :] == jnp.arange(v, dtype=i.dtype)[:, None]).astype(dtype)
            for i, v in zip(ids, Vs)
        ],
        axis=0,
    )  # (ΣV, A): one 1 per feature block
    return jnp.dot(
        blockdiag_t, onehot_t, preferred_element_type=jnp.float32
    ).astype(dtype)
