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
from .layers import Linear, _xavier_kernel_init

POOLING_TYPES = ("attention", "mean", "max", "sum")

# ``graph_axis``: set when atoms are halo-sharded over a mesh axis
# (parallel/halo.py) — each device pools its local atoms and the
# per-molecule partials are combined with a small (B, D) collective; a
# molecule split across devices is thereby pooled exactly.


# --------------------------------------------------------------------- #
# Bin-packed dense pooling (data/binning.py): atoms are laid out
# (bins, ab), molecules (bins, mb), and ``pool_mat[b, m, a]`` marks
# membership.  Segment scatters become small batched MXU matmuls /
# masked dense reductions — measured ~10× faster than the scatter
# formulation on TPU v5e for the flagship batch (BASELINE.md round 2).
# --------------------------------------------------------------------- #


def _binned(x, pool_mat):
    # bf16 atom arrays stay bf16 on the MXU (the membership matrix is exact
    # 0/1 in bf16); accumulation is forced fp32 by the einsum callers, so
    # the only rounding is the one already present in the bf16 inputs.
    nb, mb, ab = pool_mat.shape
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    ohf = pool_mat.astype(dt)
    xb = x.reshape(nb, ab, -1).astype(dt)
    return nb, mb, ab, ohf, xb


def binned_sum_pool(x, pool_mat):
    nb, mb, ab, ohf, xb = _binned(x, pool_mat)
    return jnp.einsum(
        "bma,bad->bmd", ohf, xb, preferred_element_type=jnp.float32
    ).reshape(nb * mb, -1)


def binned_mean_pool(x, pool_mat):
    nb, mb, ab, ohf, xb = _binned(x, pool_mat)
    tot = jnp.einsum("bma,bad->bmd", ohf, xb, preferred_element_type=jnp.float32)
    cnt = jnp.maximum(pool_mat.sum(axis=2).astype(jnp.float32), 1.0)
    return (tot / cnt[..., None]).reshape(nb * mb, -1)


def binned_max_pool(x, pool_mat):
    nb, mb, ab, ohf, xb = _binned(x, pool_mat)
    big = jnp.where(
        pool_mat[:, :, :, None] > 0, xb[:, None, :, :], -jnp.inf
    )  # (bins, mb, ab, D) — fused into the reduce by XLA
    out = jnp.max(big, axis=2)
    out = jnp.where(jnp.isneginf(out), 0.0, out)  # empty slots → 0 like segment_max
    return out.reshape(nb * mb, -1)


def binned_attention_softmax(scores, pool_mat):
    """Per-molecule masked softmax of per-atom scores.

    scores: (H, A) → attention weights (H, A); padding / uncovered atoms
    get weight 0.  All reductions are dense per-bin ops.
    """
    nb, mb, ab = pool_mat.shape
    H = scores.shape[0]
    ohf = pool_mat.astype(jnp.float32)
    s = scores.T.reshape(nb, ab, H)  # (bins, ab, H)
    cover = pool_mat.sum(axis=1) > 0  # (bins, ab)
    neg = jnp.float32(-1e30)
    smax = jnp.max(
        jnp.where(pool_mat[..., None] > 0, s[:, None, :, :], neg), axis=2
    )  # (bins, mb, H)
    satom = jnp.einsum("bma,bmh->bah", ohf, jax.lax.stop_gradient(smax))
    e = jnp.where(cover[..., None], jnp.exp(s - satom), 0.0)
    denom = jnp.einsum("bma,bah->bmh", ohf, e)  # (bins, mb, H)
    denom_atom = jnp.einsum("bma,bmh->bah", ohf, denom)
    w = e / jnp.maximum(denom_atom, 1e-16)  # (bins, ab, H)
    return w.reshape(nb * ab, H).T


def binned_attention_coverage(attn, pool_mat):
    """Σ_a membership·w̄_a per molecule — the factor the pooled bias picks
    up when pooling commutes past a linear projection (≈1 for covered
    molecules, exactly 0 for empty slots)."""
    nb, mb, ab = pool_mat.shape
    wbar = attn.mean(axis=0).reshape(nb, ab)
    return jnp.einsum(
        "bma,ba->bm", pool_mat.astype(jnp.float32), wbar.astype(jnp.float32)
    ).reshape(nb * mb)


def binned_attention_pool(x, attn, pool_mat):
    """Weighted per-molecule sums for every head, then head average.

    x: (A, D) float; attn: (H, A) softmax weights; → (bins·mb, D).

    The head average commutes with the (head-independent) membership sum:
    mean_h Σ_a ohf·w_h·x = Σ_a ohf·(mean_h w_h)·x — so the weights are
    averaged over heads FIRST, cutting the pool matmul's FLOPs by H× and
    skipping the (bins, ab, H, D) intermediate entirely (exact up to fp
    reassociation).
    """
    nb, mb, ab, ohf, xb = _binned(x, pool_mat)
    wbar = attn.mean(axis=0).reshape(nb, ab).astype(xb.dtype)  # (bins, ab)
    pooled = jnp.einsum(
        "bma,bad->bmd", ohf, xb * wbar[..., None],
        preferred_element_type=jnp.float32,
    )
    return pooled.reshape(nb * mb, -1)


def mean_pool(x, atom_mol, atom_mask, num_graphs, graph_axis=None):
    seg = jnp.where(atom_mask, atom_mol, num_graphs)
    if graph_axis is None:
        x = jnp.where(atom_mask[:, None], x, 0.0)
        return segment_mean(x, seg, num_graphs)
    x = jnp.where(atom_mask[:, None], x, 0.0)
    totals = jax.lax.psum(segment_sum(x, seg, num_graphs), graph_axis)
    counts = jax.lax.psum(
        segment_sum(atom_mask.astype(x.dtype), seg, num_graphs), graph_axis
    )
    return totals / jnp.maximum(counts, 1.0)[:, None]


def max_pool(x, atom_mol, atom_mask, num_graphs, graph_axis=None):
    x = jnp.where(atom_mask[:, None], x, -jnp.inf)
    seg = jnp.where(atom_mask, atom_mol, num_graphs)
    if graph_axis is None:
        return segment_max(x, seg, num_graphs)
    out = jax.ops.segment_max(x, seg, num_segments=num_graphs)
    # all_gather + max keeps the gradient path to the argmax device
    # (pmax has no differentiation rule); (G, B, D) is a small collective
    out = jnp.max(jax.lax.all_gather(out, graph_axis), axis=0)
    # empty segments give -inf on every device; fill 0 like segment_max
    return jnp.where(jnp.isneginf(out), jnp.zeros((), out.dtype), out)


def sum_pool(x, atom_mol, atom_mask, num_graphs, graph_axis=None):
    x = jnp.where(atom_mask[:, None], x, 0.0)
    out = segment_sum(x, jnp.where(atom_mask, atom_mol, num_graphs), num_graphs)
    if graph_axis is not None:
        out = jax.lax.psum(out, graph_axis)
    return out


class _HeadParams(nn.Module):
    """Parameter container matching ``Linear(1, init='xavier')``'s tree
    (kernel (D, 1) + zero bias) so checkpoints stay layout-compatible while
    the per-head score matvecs run as ONE (A, D) @ (D, H) matmul — four
    separate matvecs each re-read the whole atom array (~1.4 ms/step on the
    flagship batch, BASELINE.md round 2)."""

    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _xavier_kernel_init, (self.in_features, 1))
        b = self.param("bias", nn.initializers.zeros_init(), (1,))
        return k, b


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
    graph_axis: str | None = None  # halo-sharded atoms: see module comment

    @nn.compact
    def __call__(
        self, x, atom_mol, atom_mask, num_graphs, *, deterministic=True,
        pool_mat=None, pre_proj=None, feature_major=False, proj_spec=None,
        act_name=None, embed_spec=None, train_mode=False,
    ):
        """With ``pre_proj=(k_cs, b_cs)``, ``x`` is the PRE-projection atom
        array — given as the LIST of concat parts [x_self, x_other] so the
        concat itself is never materialized — and pooling commutes past the
        linear concat_self_other projection (reference gnn.py:245-249):

            pool(x·K + b) = pool(x)·K + b·Σw          (exactly, per molecule)

        Scores use the folded (D, H) kernel K·K_heads (row-split per part)
        and pooling runs per part (it is columnwise), so NO (A, hidden)
        array exists anywhere in the pooled path: the A-sized
        hidden×hidden matmul (~27% of the train step's matmul FLOPs)
        shrinks to a B-sized one.  Reassociation is the only numerics
        difference (oracle parity tests cover it)."""
        temperature = self.param(
            "temperature",
            lambda key: jnp.asarray(self.initial_temperature, jnp.float32),
        )
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        D = parts[0].shape[-1] if pre_proj is None else pre_proj[0].shape[1]
        heads = [
            _HeadParams(D, name=f"attention_weights_{i}")()
            for i in range(self.num_heads)
        ]
        kernel = jnp.concatenate([k for k, _ in heads], axis=1)  # (D, H)
        bias = jnp.concatenate([b for _, b in heads])  # (H,)
        if pre_proj is not None:
            k_cs, b_cs = pre_proj
            score_k = jnp.dot(k_cs, kernel)  # (in, H) fp32 fold
            score_b = jnp.dot(b_cs, kernel) + bias
        else:
            score_k, score_b = kernel, bias
        if feature_major:
            # parts are (d_p, A): scores land in (H, A) directly, pooled
            # parts in (d_p, B) — the atom axis stays on lanes throughout
            scores32 = score_b[:, None]
            row = 0
            for p in parts:
                blk = score_k[row : row + p.shape[0]].astype(p.dtype)
                scores32 = scores32 + jax.lax.dot_general(
                    blk, p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                row += p.shape[0]
            scores = scores32 / temperature  # (H, A)
        else:
            scores32 = score_b
            row = 0
            for p in parts:
                blk = score_k[row : row + p.shape[-1]]
                scores32 = scores32 + jnp.dot(
                    p, blk.astype(p.dtype), preferred_element_type=jnp.float32
                )
                row += p.shape[-1]
            scores = scores32.T / temperature  # (H, A)

        def _project(pooled_parts, cov, parts_t=False):
            if pre_proj is None:
                return pooled_parts[0]
            k_cs, b_cs = pre_proj
            dt = parts[0].dtype
            mol = b_cs * cov[:, None]
            row = 0
            for pp in pooled_parts:  # (B, d_p) / (d_p, B) — tiny matmuls
                d_p = pp.shape[0] if parts_t else pp.shape[-1]
                blk = k_cs[row : row + d_p].astype(dt)
                if parts_t:
                    mol = mol + jax.lax.dot_general(
                        pp.astype(dt), blk, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    mol = mol + jnp.dot(
                        pp.astype(dt), blk, preferred_element_type=jnp.float32
                    )
                row += d_p
            return mol

        if pool_mat is not None and self.graph_axis is None:
            if feature_major:
                assert pre_proj is not None, "feature_major requires pre_proj"
                if (
                    proj_spec is not None
                    and self.dropout_prob == 0
                    and len(parts) == 2
                    and act_name in ("silu", "relu", "leakyrelu", "elu", "gelu")
                ):
                    from ..ops.bin_attnpool import (
                        attnpool_kernel_enabled,
                        binned_attnpool_proj_t,
                        embed_fold_enabled,
                    )

                    mode = attnpool_kernel_enabled(train_mode)
                    if mode is not None:
                        # Fully-fused path (ops/bin_attnpool.py): the
                        # x_self projection, scores, per-molecule softmax
                        # and both weighted pools run in ONE kernel — the
                        # (x_self_dim, A) array never exists in HBM.
                        # parts[0] (the XLA-computed x_self) goes unused
                        # here, so its producer is DCE'd in the train
                        # step.  Temperature/concat folds stay outside
                        # (differentiable).
                        embT, k_blk, b_blk = proj_spec
                        xs_dim = k_blk.shape[1]
                        res = binned_attnpool_proj_t(
                            embT, k_blk, b_blk, act_name, parts[1], pool_mat,
                            score_k[:xs_dim] / temperature,
                            score_k[xs_dim:] / temperature,
                            score_b / temperature,
                            interpret=mode == "interpret",
                            embed_spec=(
                                embed_spec if embed_fold_enabled() else None
                            ),
                        )
                        if res is not None:
                            ps, po, cov, attn = res
                            return _project([ps, po], cov, parts_t=True), attn
                attn = binned_attention_softmax_t(scores, pool_mat)
                # per-part pools: ragged widths (359/153) are SUBLANE dims
                # in feature-major — no lane padding, and no (512, A)
                # concat for XLA to materialize + relayout in backward
                pooled = _project(
                    [binned_attention_pool_t(p, attn, pool_mat) for p in parts],
                    binned_attention_coverage(attn, pool_mat),
                    parts_t=True,
                )
                if self.dropout_prob > 0:
                    pooled = nn.Dropout(self.dropout_prob)(
                        pooled, deterministic=deterministic
                    )
                return pooled, attn
            if pre_proj is not None and self.dropout_prob == 0 and len(parts) == 2:
                from ..ops.bin_pool import (
                    binned_attention_pool_fused,
                    pool_kernel_enabled,
                )

                mode = pool_kernel_enabled()
                if mode is not None:
                    # Fused Pallas pool (ops/bin_pool.py): scores → masked
                    # softmax → weighted pooled parts in one kernel, atom
                    # arrays read once.  Temperature folded into the score
                    # kernel (differentiable jnp fold).
                    ps, po, cov, attn = binned_attention_pool_fused(
                        parts[0],
                        parts[1],
                        pool_mat,
                        score_k / temperature,
                        score_b / temperature,
                        interpret=mode == "interpret",
                    )
                    return _project([ps, po], cov), attn
            # bin-packed dense path (no scatters; see module comment).
            # Ragged part widths (359/153) make XLA transpose-pad the pool
            # einsum (~1.8 ms of layout copies at 8192 mols) — concatenate
            # to the lane-aligned full width and pool once instead.
            attn = binned_attention_softmax(scores, pool_mat)
            xc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
            pooled = _project(
                [binned_attention_pool(xc, attn, pool_mat)],
                binned_attention_coverage(attn, pool_mat) if pre_proj else None,
            )
            if self.dropout_prob > 0:
                pooled = nn.Dropout(self.dropout_prob)(
                    pooled, deterministic=deterministic
                )
            return pooled, attn

        seg_ids = jnp.where(atom_mask, atom_mol, num_graphs)
        if self.graph_axis is None:
            attn = segment_softmax(scores, seg_ids, num_graphs, mask=atom_mask)
        else:
            # Cross-device segment softmax: global per-molecule max (pmax)
            # and normalizer (psum) make split molecules exact.
            masked = jnp.where(atom_mask, scores, -jnp.inf)
            seg_max = jax.vmap(
                lambda s: jax.ops.segment_max(s, seg_ids, num_segments=num_graphs)
            )(masked)
            # stability shift only — mathematically gradient-free (cancels in
            # the softmax), and pmax has no differentiation rule
            seg_max = jax.lax.stop_gradient(
                jax.lax.pmax(jax.lax.stop_gradient(seg_max), self.graph_axis)
            )
            seg_max = jnp.where(jnp.isneginf(seg_max), 0.0, seg_max)
            expd = jnp.where(atom_mask, jnp.exp(masked - seg_max[:, seg_ids]), 0.0)
            denom = jax.vmap(lambda e: segment_sum(e, seg_ids, num_graphs))(expd)
            denom = jax.lax.psum(denom, self.graph_axis)
            attn = expd / jnp.maximum(denom[:, seg_ids], 1e-16)

        # head average commutes with the segment sum (see binned_attention_pool):
        # one (A, D) weighted scatter instead of H of them
        wbar = attn.mean(axis=0)
        if pre_proj is not None:
            # segment sums accumulate at the array dtype; keep fp32 like
            # the post-projection path did
            parts = [p.astype(jnp.float32) for p in parts]
        pooled_parts = []
        for p in parts:
            weighted = p * wbar.astype(p.dtype)[:, None]  # (A, d_p)
            pooled = segment_sum(weighted, seg_ids, num_graphs)
            if self.graph_axis is not None:
                pooled = jax.lax.psum(pooled, self.graph_axis)
            pooled_parts.append(pooled)
        cov = None
        if pre_proj is not None:
            cov = segment_sum(wbar, seg_ids, num_graphs)
            if self.graph_axis is not None:
                cov = jax.lax.psum(cov, self.graph_axis)
        pooled = _project(pooled_parts, cov)

        if self.dropout_prob > 0:
            pooled = nn.Dropout(self.dropout_prob)(pooled, deterministic=deterministic)
        return pooled, attn


# --------------------------------------------------------------------- #
# Feature-major (xT (D, A)) twins of the binned pools: same math, but the
# atom axis stays on lanes end-to-end (models/gnn.py binned fast path) —
# no (A, D)-major arrays or layout transposes exist anywhere between the
# embedding and the pooled (B-sized) molecule array.
# --------------------------------------------------------------------- #


def _wpool_mode():
    from ..ops.bin_wpool import wpool_kernel_enabled

    return wpool_kernel_enabled()


def binned_sum_pool_t(xT, pool_mat):
    """xT (D, A) → pooledT (D, nb·mb) fp32."""
    nb, mb, ab = pool_mat.shape
    dt = xT.dtype if xT.dtype == jnp.bfloat16 else jnp.float32
    mode = _wpool_mode()
    if mode is not None:
        from ..ops.bin_wpool import binned_wpool_t

        ones = jnp.ones((1, xT.shape[1]), jnp.float32)
        out = binned_wpool_t(
            xT.astype(dt), ones, pool_mat, interpret=mode == "interpret"
        )
        if out is not None:
            return out
    pooled = jnp.einsum(
        "dba,bma->dbm",
        xT.reshape(xT.shape[0], nb, ab).astype(dt),
        pool_mat.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return pooled.reshape(xT.shape[0], nb * mb)


def binned_mean_pool_t(xT, pool_mat):
    tot = binned_sum_pool_t(xT, pool_mat)
    cnt = jnp.maximum(pool_mat.sum(axis=2).astype(jnp.float32), 1.0)
    return tot / cnt.reshape(1, -1)


def binned_attention_softmax_t(scores, pool_mat):
    """Per-molecule masked softmax, feature-major internals.

    scores (H, A) → attn (H, A); identical numbers to
    :func:`binned_attention_softmax` (same mask value, stop-gradient max
    shift, denominator floor), but every intermediate keeps the atom axis
    minor — no (A, H)-major reshapes for XLA to transpose-pad.
    """
    nb, mb, ab = pool_mat.shape
    H = scores.shape[0]
    ohf = pool_mat.astype(jnp.float32)
    s = scores.reshape(H, nb, ab)
    cover = pool_mat.sum(axis=1) > 0  # (nb, ab)
    neg = jnp.float32(-1e30)
    smax = jnp.max(
        jnp.where(pool_mat[None] > 0, s[:, :, None, :], neg), axis=3
    )  # (H, nb, mb)
    satom = jnp.einsum("bma,hbm->hba", ohf, jax.lax.stop_gradient(smax))
    e = jnp.where(cover[None], jnp.exp(s - satom), 0.0)
    denom = jnp.einsum("bma,hba->hbm", ohf, e)
    denom_atom = jnp.einsum("bma,hbm->hba", ohf, denom)
    w = e / jnp.maximum(denom_atom, 1e-16)
    return w.reshape(H, nb * ab)


def binned_attention_pool_t(xT, attn, pool_mat):
    """Head-averaged weighted pool, feature-major: xT (D, A), attn (H, A)
    → pooledT (D, nb·mb) fp32 (weights averaged over heads first, as in
    :func:`binned_attention_pool`)."""
    nb, mb, ab = pool_mat.shape
    dt = xT.dtype if xT.dtype == jnp.bfloat16 else jnp.float32
    mode = _wpool_mode()
    if mode is not None:
        # flat lane-window Pallas pool (ops/bin_wpool.py): the batched
        # einsum below makes XLA relayout-copy ~7 ms/step at flagship shape
        from ..ops.bin_wpool import binned_wpool_t

        out = binned_wpool_t(
            xT.astype(dt), attn.mean(axis=0), pool_mat,
            interpret=mode == "interpret",
        )
        if out is not None:
            return out
    wbar = attn.mean(axis=0).reshape(nb, ab).astype(dt)
    xb = xT.reshape(xT.shape[0], nb, ab).astype(dt)
    pooled = jnp.einsum(
        "dba,bma->dbm", xb * wbar[None], pool_mat.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return pooled.reshape(xT.shape[0], nb * mb)
