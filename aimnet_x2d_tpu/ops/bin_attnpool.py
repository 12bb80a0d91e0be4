"""Fused feature-major attention pooling with in-kernel x_self projection.

The flagship train step's remaining XLA-fusion tail (round-2 profile at
32k molecules, ~14 ms of a 57.6 ms step) is the x_self chain: the
(x_self_dim, A) projection is materialized to HBM (``fusion.4``, two
470 MB bf16 arrays), re-read by the attention-score matmul, re-read by
the pool kernel, and its backward streams it three more times (dx from
the pool, dx from the scores, dW, bias grads).  Every stage is
HBM-bandwidth-bound on an array that exists only to be pooled.

This kernel removes the array from HBM entirely.  Per lane-packed bin
group it computes, all in VMEM:

    x_self = act(W_selfᵀ @ emb + b)            (256→Ds rows, MXU)
    s      = w_sᵀ x_self + w_oᵀ x_other + b    (H, lanes) fp32
    attn   = per-molecule masked softmax(s)     (bin-local: molecules
                                                 never span bins)
    w̄      = mean over heads
    pooled = (x ⊙ w̄) @ pmᵀ  per part; cov = w̄ @ pmᵀ

so the only HBM traffic is emb (256, A) + x_other (Do, A) in, pooled
molecule arrays + attention weights out.  x_other is the MP megakernel's
output and is read once.  The custom VJP recomputes the chain in VMEM
(same trade as ops/bin_mp.py) and emits demb / dx_other / fp32 weight
grads; the attn output is informational and stop-gradient'd by the
wrapper (no reference code path differentiates returned attention
weights — same contract as ops/bin_pool.py).

Numerics: identical op sequence to the unfused feature-major path —
fp32 MXU accumulation → compute-dtype cast → compute-dtype bias add →
activation (models/gnn.py::_proj_rows_t), fp32 score accumulation, the
-1e30 masked max / stop-gradient shift / 1e-16 denominator floor of
models/pooling.py::binned_attention_softmax_t, compute-dtype pool
products with fp32 accumulation (ops/bin_wpool.py).  The learnable
temperature and concat_self_other folds stay OUTSIDE the op (plain
differentiable jnp, as in ops/bin_pool.py), so d/dT comes from XLA.

Reference semantics: multi-head attention pooling of
src/models/pooling.py:83-172 under the head-average-first algebra
(models/pooling.py::binned_attention_pool docstring).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bin_mp import _act_grad, _act_value, _dot_c00, _dot_c11
from .embed import onehot_rows


def embed_fold_enabled() -> bool:
    """Fold the embedding one-hot matmul into the fused kernels.

    Default OFF: measured at the flagship shape (v5e, 32k molecules) the
    fold REGRESSES the train step 50.7 → 56.1 ms — the one-hot build +
    (ΣV→E) matmul reruns per grid step at four sites (two kernels × fwd +
    bwd-recompute), which costs more than the ~1.3 GB/step of embedding
    HBM traffic it removes.  Kept validated (parity tests toggle it) as
    an ``AIMNET_EMBED_FOLD=1`` option for shapes where HBM is scarcer."""
    return os.environ.get("AIMNET_EMBED_FOLD", "").lower() in (
        "1", "on", "true",
    )


def attnpool_kernel_enabled(train_mode: bool = True) -> str | None:
    """Default ON for the TPU backend in TRAINING; ``AIMNET_ATTNPOOL_KERNEL=0``
    disables, ``=1`` forces on, ``=interpret`` forces the interpreter path
    off-TPU (tests).

    ``train_mode=False`` (eval / inference / init — forward-only) turns
    the unforced default OFF: without a backward pass the fold saves
    <1 ms/batch while its Mosaic kernels cost ~10× the XLA forward's
    remote-compile time (measured ~2 min vs ~13 s cold CLI inference on
    axon, which has no persistent compile cache), and the XLA forward is
    equally fast per-batch.  Explicit env settings override for tests."""
    env = os.environ.get("AIMNET_ATTNPOOL_KERNEL", "").lower()
    if env in ("0", "off", "false"):
        return None
    if env == "interpret":
        return "interpret"
    if env in ("1", "on", "true"):
        return "tpu" if jax.default_backend() == "tpu" else "interpret"
    if train_mode and jax.default_backend() == "tpu":
        return "tpu"
    return None


_FALLBACK_WARNED: set = set()


def _f32dot(a, b):  # (M, K) @ (K, N) → fp32
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


PROJ_CHUNK = 128  # row chunk for the in-kernel projection: bounds the fp32
#                  matmul transient to (128, lanes) so the forward fits
#                  default-scoped-vmem contexts (init/eval jits)


def _pick_group(nb, mb, ab, interpret, bwd=False):
    """Smallest G with nb % G == 0 and 128-divisible lane windows on both
    the atom (G·ab) and molecule (G·mb) sides — smallest keeps VMEM low
    (the forward must fit default-scoped-vmem contexts like init/eval);
    issue overhead is amortized by the full-width projection/score
    matmuls.  ``AIMNET_ATTNPOOL_GROUP`` (or the per-direction
    ``AIMNET_ATTNPOOL_GROUP_FWD`` / ``_BWD``) overrides.  None ⇒ no legal
    grouping (caller falls back to the unfused path)."""
    env = os.environ.get(
        "AIMNET_ATTNPOOL_GROUP_BWD" if bwd else "AIMNET_ATTNPOOL_GROUP_FWD"
    ) or os.environ.get("AIMNET_ATTNPOOL_GROUP")
    if env:
        g = int(env)
        legal = nb % g == 0 and (
            interpret or ((g * ab) % 128 == 0 and (g * mb) % 128 == 0)
        )
        return g if legal else None
    legal_gs = [
        G
        for G in range(1, min(nb, 64) + 1)
        if nb % G == 0
        and (interpret or ((G * ab) % 128 == 0 and (G * mb) % 128 == 0))
    ]
    if not legal_gs:
        return None
    if bwd:
        # round-4 on-chip sweep: the backward's softmax/pool chain
        # amortizes issue overhead at G=8 (48.8 → 48.3 ms/step at 32k;
        # G=16 measured the same within noise) — prefer the largest legal
        # group ≤ 8; the forward stays at the smallest legal group (it
        # must fit default-scoped-vmem contexts like init/eval).
        le8 = [G for G in legal_gs if G <= 8]
        return max(le8) if le8 else legal_gs[0]
    return legal_gs[0]


def _proj_act(kb, bb, emb, act_name, dt):
    """x_self rows = act((kbᵀ @ emb).astype(dt) + bb), chunked over output
    rows.  Identical per-element op sequence to models/gnn.py::
    _proj_rows_t (chunking splits output rows, not the contraction)."""
    ds = kb.shape[1]
    outs = []
    for r0 in range(0, ds, PROJ_CHUNK):
        r1 = min(r0 + PROJ_CHUNK, ds)
        blk = jax.lax.slice_in_dim(kb, r0, r1, axis=1)
        outs.append(_dot_c00(blk, emb).astype(dt))
    t = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    t = t + bb
    return t, _act_value(act_name, t)


def _softmax_bin(s_g, pm_g):
    """Per-molecule masked softmax for one bin, feature-major.

    s_g (H, ab) fp32, pm_g (mb, ab) int8 → (attn (H, ab), pmf, cover).
    Constants/order mirror models/pooling.py::binned_attention_softmax_t.
    """
    pmf = pm_g.astype(jnp.float32)
    cover = jnp.sum(pmf, axis=0, keepdims=True)  # (1, ab)
    neg = jnp.float32(-1e30)
    masked = jnp.where(pmf[:, None, :] > 0, s_g[None], neg)  # (mb, H, ab)
    smax = jnp.max(masked, axis=2)  # (mb, H)
    satom = _dot_c00(smax, pmf)  # (H, ab) — stop-grad shift (bwd ignores)
    e = jnp.where(cover > 0, jnp.exp(s_g - satom), 0.0)
    denom = _dot_c11(e, pmf)  # (H, mb)
    denom_atom = _f32dot(denom, pmf)  # (H, ab)
    attn = e / jnp.maximum(denom_atom, 1e-16)
    return attn, pmf, cover


@functools.lru_cache(maxsize=16)
def _make_attnpool_op(act_name, dtype_name, interpret, vocab_sizes=None):
    """``vocab_sizes=None``: first operand is the materialized embT (E, A).
    With a vocab tuple, it is the stacked code rows (F, A) int32 and the
    weights gain a leading block-diagonal table bd (E, ΣV): the embedding
    one-hot matmul runs in-kernel (ops/embed.py semantics) and the backward
    emits d_bd instead of a (E, A) demb array — the embedding array never
    exists in HBM in either direction."""
    dt = jnp.dtype(dtype_name)
    n_bd = 1 if vocab_sizes else 0

    def _common_fwd(emb_ref, xo_ref, pm_ref, ws):
        xo = xo_ref[...]  # (Do, G·ab) dt
        pm = pm_ref[...]  # (G, mb, ab) int8
        oh = None
        if vocab_sizes:
            oh = onehot_rows(emb_ref[...], vocab_sizes, dt)  # (ΣV, G·ab)
            emb = _f32dot(ws[0][...], oh).astype(dt)  # (E, G·ab)
            kb_ref, bb_ref, ks_ref, ko_ref, sb_ref = ws[1:]
        else:
            emb = emb_ref[...]  # (E, G·ab) dt
            kb_ref, bb_ref, ks_ref, ko_ref, sb_ref = ws
        t, v = _proj_act(kb_ref[...], bb_ref[...], emb, act_name, dt)
        s = sb_ref[...] + _dot_c00(ks_ref[...], v) + _dot_c00(ko_ref[...], xo)
        return emb, oh, xo, pm, t, v, s

    def fwd_kernel(
        emb_ref, xo_ref, pm_ref, *rest,
    ):
        ws = rest[: 5 + n_bd]
        ps_ref, po_ref, cov_ref, attn_ref = rest[5 + n_bd :]
        _, _, xo, pm, _, v, s = _common_fwd(emb_ref, xo_ref, pm_ref, ws)
        G, mb, ab = pm.shape
        ps_parts, po_parts, cov_parts, attn_parts = [], [], [], []
        for g in range(G):
            s_g = jax.lax.slice_in_dim(s, g * ab, (g + 1) * ab, axis=1)
            attn_g, pmf, _ = _softmax_bin(s_g, pm[g])
            wbar = jnp.mean(attn_g, axis=0, keepdims=True)  # (1, ab) fp32
            wdt = wbar.astype(dt)
            v_g = jax.lax.slice_in_dim(v, g * ab, (g + 1) * ab, axis=1)
            xo_g = jax.lax.slice_in_dim(xo, g * ab, (g + 1) * ab, axis=1)
            pmdt = pm[g].astype(dt)
            ps_parts.append(_dot_c11(v_g * wdt, pmdt))  # (Ds, mb) fp32
            po_parts.append(_dot_c11(xo_g * wdt, pmdt))
            cov_parts.append(_dot_c11(wbar, pmf))  # (1, mb) fp32
            attn_parts.append(attn_g)
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
        ps_ref[...] = cat(ps_parts)
        po_ref[...] = cat(po_parts)
        cov_ref[...] = cat(cov_parts)
        attn_ref[...] = cat(attn_parts)

    def bwd_kernel(*refs):
        emb_ref, xo_ref, pm_ref = refs[:3]
        ws = refs[3 : 8 + n_bd]
        gps_ref, gpo_ref, gcov_ref, attn_ref = refs[8 + n_bd : 12 + n_bd]
        if vocab_sizes:
            (dxo_ref, dbd_ref, dkb_ref, dbb_ref, dks_ref, dko_ref,
             dsb_ref) = refs[12 + n_bd :]
            kb_ref = ws[1]
        else:
            (demb_ref, dxo_ref, dkb_ref, dbb_ref, dks_ref, dko_ref,
             dsb_ref) = refs[12 + n_bd :]
            kb_ref = ws[0]
        # The forward's attention weights stream back in from HBM (they
        # are one of its outputs — (H, A) fp32, ~10 MB at the flagship
        # shape), so the backward never re-runs the VPU-bound masked-max/
        # exp/denominator chain: round-4 profiling put the attnpool
        # backward at ~40% of attainable, dominated by exactly that
        # recompute (BASELINE.md roofline; VERDICT r4 #3).  Values are
        # bit-identical to a recompute, so numerics are unchanged.
        emb, oh, xo, pm, t, v, s = _common_fwd(emb_ref, xo_ref, pm_ref, ws)
        attn = attn_ref[...]  # (H, G·ab) fp32
        ks_ref, ko_ref = ws[2 + n_bd], ws[3 + n_bd]
        G, mb, ab = pm.shape
        H = s.shape[0]
        gps = gps_ref[...]  # (Ds, G·mb) fp32
        gpo = gpo_ref[...]  # (Do, G·mb) fp32
        gcov = gcov_ref[...]  # (1, G·mb) fp32
        dv_parts, dxo_parts, ds_parts = [], [], []
        for g in range(G):
            attn_g = jax.lax.slice_in_dim(attn, g * ab, (g + 1) * ab, axis=1)
            pmf = pm[g].astype(jnp.float32)
            wbar = jnp.mean(attn_g, axis=0, keepdims=True)  # (1, ab)
            v_g = jax.lax.slice_in_dim(v, g * ab, (g + 1) * ab, axis=1)
            xo_g = jax.lax.slice_in_dim(xo, g * ab, (g + 1) * ab, axis=1)
            pmdt = pm[g].astype(dt)
            gps_g = jax.lax.slice_in_dim(gps, g * mb, (g + 1) * mb, axis=1)
            gpo_g = jax.lax.slice_in_dim(gpo, g * mb, (g + 1) * mb, axis=1)
            gcov_g = jax.lax.slice_in_dim(gcov, g * mb, (g + 1) * mb, axis=1)
            # pooled = (x⊙w̄) @ pmᵀ: cotangents arrive fp32, multiply at the
            # compute dtype like ops/bin_wpool.py's backward
            gs_atom = _f32dot(gps_g.astype(dt), pmdt)  # (Ds, ab)
            go_atom = _f32dot(gpo_g.astype(dt), pmdt)  # (Do, ab)
            dv_parts.append(gs_atom * wbar)
            dxo_parts.append(go_atom * wbar)
            dwbar = (
                jnp.sum(gs_atom * v_g.astype(jnp.float32), axis=0, keepdims=True)
                + jnp.sum(go_atom * xo_g.astype(jnp.float32), axis=0, keepdims=True)
                + _f32dot(gcov_g, pmf)
            )  # (1, ab)
            # w̄ = mean_h attn → d_attn = dw̄/H; softmax bwd per molecule:
            # ds = attn·(d_attn − Σ_mol attn·d_attn)
            dattn = dwbar / jnp.float32(H)
            t_mol = _dot_c11(attn_g * dattn, pmf)  # (H, mb)
            t_atom = _f32dot(t_mol, pmf)  # (H, ab)
            ds_parts.append(attn_g * dattn - attn_g * t_atom)
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
        dv32 = cat(dv_parts)  # (Ds, G·ab) fp32
        dxo32 = cat(dxo_parts)
        ds = cat(ds_parts).astype(dt)  # (H, G·ab)
        # scores = ksᵀ v + koᵀ xo + sb
        ks = ks_ref[...]
        ko = ko_ref[...]
        dv32 = dv32 + _f32dot(ks, ds)  # (Ds, G·ab)
        dxo32 = dxo32 + _f32dot(ko, ds)
        dxo_ref[...] = dxo32.astype(dxo_ref.dtype)
        d_ks = _dot_c11(v, ds)  # (Ds, H) fp32
        d_ko = _dot_c11(xo, ds)
        d_sb = jnp.sum(ds.astype(jnp.float32), axis=1, keepdims=True)  # (H, 1)
        # through the activation: same fp32-compare grads as ops/bin_mp.py
        dt32 = dv32 * _act_grad(act_name, t).astype(jnp.float32)
        dtc = dt32.astype(dt)  # (Ds, G·ab)
        d_kb = _dot_c11(emb, dtc)  # (E, Ds) fp32
        d_bb = jnp.sum(dt32, axis=1, keepdims=True)  # (Ds, 1)
        if vocab_sizes:
            # demb never leaves VMEM: its table cotangent accumulates here
            # (compute-dtype round at the emb boundary, like the unfused
            # path's cast vjp)
            dembc = _f32dot(kb_ref[...], dtc).astype(dt)  # (E, G·ab)
            d_bd = _dot_c11(dembc, oh)  # (E, ΣV) fp32
        else:
            demb_ref[...] = _f32dot(kb_ref[...], dtc).astype(demb_ref.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            if vocab_sizes:
                dbd_ref[...] = jnp.zeros_like(dbd_ref)
            dkb_ref[...] = jnp.zeros_like(dkb_ref)
            dbb_ref[...] = jnp.zeros_like(dbb_ref)
            dks_ref[...] = jnp.zeros_like(dks_ref)
            dko_ref[...] = jnp.zeros_like(dko_ref)
            dsb_ref[...] = jnp.zeros_like(dsb_ref)

        if vocab_sizes:
            dbd_ref[...] += d_bd
        dkb_ref[...] += d_kb
        dbb_ref[...] += d_bb
        dks_ref[...] += d_ks
        dko_ref[...] += d_ko
        dsb_ref[...] += d_sb

    def _lanes(rows, lanes):
        return pl.BlockSpec((rows, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)

    def _pm_spec(G, mb, ab):
        return pl.BlockSpec((G, mb, ab), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def _const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    def _cast_weights(ws_f32):
        # fp32 parameters cross the custom_vjp boundary; the compute-dtype
        # casts live here in the traced prelude (XLA folds them into the
        # weight fetch) so weight cotangents stay fp32 — same convention
        # as ops/bin_mp.py.  sb stays fp32 (the unfused path accumulates
        # scores in fp32 from a fp32 bias).
        pre = ()
        if vocab_sizes:
            pre = (ws_f32[0].astype(dt),)  # block-diag table bd (E, ΣV)
            ws_f32 = ws_f32[1:]
        kb, bb, ks, ko, sb = ws_f32
        return pre + (
            kb.astype(dt),
            bb.astype(dt).reshape(-1, 1),
            ks.astype(dt),
            ko.astype(dt),
            sb.astype(jnp.float32).reshape(-1, 1),
        )

    def _dims(emb, xo, ws_f32):
        kb = ws_f32[n_bd]
        ks = ws_f32[2 + n_bd]
        return emb.shape[0], emb.shape[1], xo.shape[0], kb.shape[1], ks.shape[1]

    def forward(emb, xo, pm, *ws_f32):
        e_in, A, do, ds, h = _dims(emb, xo, ws_f32)
        nb, mb, ab = pm.shape
        G = _pick_group(nb, mb, ab, interpret)
        ws = _cast_weights(ws_f32)
        weight_specs = [_const(x.shape) for x in ws]
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb // G,),
            in_specs=[
                _lanes(e_in, G * ab), _lanes(do, G * ab), _pm_spec(G, mb, ab),
                *weight_specs,
            ],
            out_specs=[
                _lanes(ds, G * mb), _lanes(do, G * mb), _lanes(1, G * mb),
                _lanes(h, G * ab),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ds, nb * mb), jnp.float32),
                jax.ShapeDtypeStruct((do, nb * mb), jnp.float32),
                jax.ShapeDtypeStruct((1, nb * mb), jnp.float32),
                jax.ShapeDtypeStruct((h, A), jnp.float32),
            ],
            interpret=interpret,
        )(emb, xo, pm, *ws)

    def backward_call(emb, xo, pm, ws_f32, gps, gpo, gcov, attn):
        e_in, A, do, ds, h = _dims(emb, xo, ws_f32)
        nb, mb, ab = pm.shape
        G = _pick_group(nb, mb, ab, interpret, bwd=True)
        ws = _cast_weights(ws_f32)
        weight_specs = [_const(x.shape) for x in ws]
        kb_shape = ws[n_bd].shape
        if vocab_sizes:
            # codes get no cotangent; d_bd replaces the (E, A) demb output
            dx_specs = [_lanes(do, G * ab), _const(ws[0].shape)]
            dx_shapes = [
                jax.ShapeDtypeStruct((do, A), xo.dtype),
                jax.ShapeDtypeStruct(ws[0].shape, jnp.float32),
            ]
        else:
            dx_specs = [_lanes(e_in, G * ab), _lanes(do, G * ab)]
            dx_shapes = [
                jax.ShapeDtypeStruct((e_in, A), emb.dtype),
                jax.ShapeDtypeStruct((do, A), xo.dtype),
            ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb // G,),
            in_specs=[
                _lanes(e_in, G * ab), _lanes(do, G * ab), _pm_spec(G, mb, ab),
                *weight_specs,
                _lanes(ds, G * mb), _lanes(do, G * mb), _lanes(1, G * mb),
                _lanes(h, G * ab),
            ],
            out_specs=[
                *dx_specs,
                _const(kb_shape), _const((ds, 1)),
                _const(ws[2 + n_bd].shape), _const(ws[3 + n_bd].shape),
                _const((h, 1)),
            ],
            out_shape=[
                *dx_shapes,
                jax.ShapeDtypeStruct(kb_shape, jnp.float32),
                jax.ShapeDtypeStruct((ds, 1), jnp.float32),
                jax.ShapeDtypeStruct(ws[2 + n_bd].shape, jnp.float32),
                jax.ShapeDtypeStruct(ws[3 + n_bd].shape, jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ],
            interpret=interpret,
        )(emb, xo, pm, *ws, gps, gpo, gcov, attn)
        return outs

    @jax.custom_vjp
    def op(emb, xo, pm, *ws_f32):
        return forward(emb, xo, pm, *ws_f32)

    def op_fwd(emb, xo, pm, *ws_f32):
        outs = forward(emb, xo, pm, *ws_f32)
        # the attn output rides along as a residual: the backward reads
        # it back instead of recomputing the softmax chain in VMEM
        return outs, (emb, xo, pm, ws_f32, outs[3])

    def op_bwd(res, g):
        emb, xo, pm, ws_f32, attn = res
        gps, gpo, gcov, _gattn = g  # attn is stop-gradient'd by the wrapper
        outs = backward_call(emb, xo, pm, ws_f32, gps, gpo, gcov, attn)
        if vocab_sizes:
            dxo, dbd, dkb, dbb, dks, dko, dsb = outs
            return (None, dxo, None, dbd, dkb, dbb.reshape(-1), dks, dko,
                    dsb.reshape(-1))
        demb, dxo, dkb, dbb, dks, dko, dsb = outs
        return (demb, dxo, None, dkb, dbb.reshape(-1), dks, dko,
                dsb.reshape(-1))

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_attnpool_proj_t(
    embT, k_blk, b_blk, act_name, xoT, pool_mat, score_k_self, score_k_other,
    score_b, *, interpret: bool = False, embed_spec=None,
):
    """Fused projection → scores → softmax → pool, feature-major.

    embT (E, A) compute dtype (concat one-hot embeddings); k_blk (E, Ds) /
    b_blk (Ds,) fp32 — the x_self column block of embedding_projection;
    xoT (Do, A) compute dtype (post-MP x_other); pool_mat (nb, mb, ab)
    int8; score_k_self (Ds, H) / score_k_other (Do, H) / score_b (H,)
    fp32 with the concat_self_other and temperature folds already applied
    (differentiable, caller-side).  Returns (pooled_self (Ds, B),
    pooled_other (Do, B), coverage (B,), attn (H, A)) all fp32 with
    B = nb·mb, or ``None`` when no legal lane-window grouping exists.

    With ``embed_spec=(codes (F, A) int32, blockdiag_t (E, ΣV) fp32,
    vocab_sizes)`` the embedding one-hot matmul also runs in-kernel
    (ops/embed.py semantics) — embT is ignored and never materialized.
    """
    nb, mb, ab = pool_mat.shape
    if (_pick_group(nb, mb, ab, interpret) is None
            or _pick_group(nb, mb, ab, interpret, bwd=True) is None):
        # One-time notice (ADVICE r2): the caller silently falls back to
        # the unfused XLA path, which is correct but slower — surface why.
        key = (nb, mb, ab)
        if key not in _FALLBACK_WARNED:
            _FALLBACK_WARNED.add(key)
            import sys

            print(
                f"aimnet_x2d_tpu: attnpool fused kernel disabled for bin "
                f"layout (nb={nb}, mb={mb}, ab={ab}) — no lane-window "
                f"grouping with G*ab and G*mb multiples of 128; using the "
                f"unfused XLA pooling path",
                file=sys.stderr,
            )
        return None
    if embed_spec is not None:
        codes, bd_t, vocab_sizes = embed_spec
        dt = jnp.dtype(xoT.dtype)
        op = _make_attnpool_op(act_name, dt.name, interpret, tuple(vocab_sizes))
        ps, po, cov, attn = op(
            codes.astype(jnp.int32),
            xoT.astype(dt),
            pool_mat,
            bd_t,
            k_blk,
            b_blk,
            score_k_self,
            score_k_other,
            score_b,
        )
        return ps, po, cov.reshape(-1), jax.lax.stop_gradient(attn)
    dt = jnp.dtype(embT.dtype)
    op = _make_attnpool_op(act_name, dt.name, interpret)
    ps, po, cov, attn = op(
        embT,
        xoT.astype(dt),
        pool_mat,
        k_blk,
        b_blk,
        score_k_self,
        score_k_other,
        score_b,
    )
    return ps, po, cov.reshape(-1), jax.lax.stop_gradient(attn)
