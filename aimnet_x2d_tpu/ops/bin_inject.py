"""Fully-fused charge-equilibration + stereochemistry + shell-conv layer.

BASELINE.json config 3 (``--use_partial_charges --use_stereochemistry``)
ran 183.7 ms/step at 32k molecules vs the flagship's 46.7 (round 4): the
per-layer injections executed as XLA between opaque per-layer kernels.
The round-5 phase-1 fusion moved the charge overlay + cis/trans
aggregation + stereo projection in-kernel but left the tetrahedral
polynomial and the charge-row computation in XLA — profiling showed that
remaining per-layer glue (gathers, a segment-sum scatter over the (A, D)
correction, their transposes and autodiff) still cost ~105 ms/step of
HBM-bound fusions plus per-op remote-dispatch gaps.

This op is the phase-2 design: ONE pallas_call per layer per direction
runs the ENTIRE inject→layer round in VMEM —

    q/f     rows 0/1 equilibrated per molecule via the per-bin pool
            matrix (Q3; reference gnn.py:622-658) — bin-local matmuls
    cct     x' + x' @ S per bin (signed cis/trans int8 adjacency: the
            dense form of Q6's scatters with Q7's duplication baked in)
    tet     the tetrahedral roll-polynomial (Q6; reference
            gnn.py:387-462) on per-bin center tables: a center's four
            neighbors share its molecule's bin, so the gather AND the
            scatter are per-bin one-hot matmuls over the host-built
            ``MolBatch.tet_bin`` (bins, 4, Tc) table — no segment ops,
            no (A, D) correction array, ever
    pre     = k0ᵀx' + k1ᵀcct + k2ᵀtet + b   (single fp32 accumulation →
            one compute-dtype cast, the same cast structure as the
            unfused path's fused dot sum)
    out     = shell_conv(pre) + pre          (in-kernel layer + residual)

so the only (D, A)-scale HBM traffic per layer is xT in and out, plus
the two int8 adjacencies and the int8 pool matrix.  The custom VJP
recomputes the chain per bin group and walks gradients back through the
layer, the projection, the polynomial (normalization, tanh scale, the
antisymmetric rolls) and the charge equilibration — all in VMEM; the op
returns dxT plus fp32 weight grads only.

Tetrahedral algebra per center slot t with neighbor embeddings
e_k (D,) gathered via one-hot (k = 0..3):
    eN_k = e_k / max(‖e_k‖, 1e-8),  sq_k = eN_k²
    P_k  = sq_{k+1}(eN_{k+2}−eN_{k+3}) + sq_{k+2}(eN_{k+3}−eN_{k+1})
         + sq_{k+3}(eN_{k+1}−eN_{k+2})          (indices mod 4 — the
                                                 jnp.roll forms)
    chir_k = any_tet · tanh(mean_k ‖e_k‖ / 3) · P_k
    Δ[:, col(t,k)] += chir_k                     (one-hot matmul)
    tet = (x' + Δ.astype(dt)) · m,  m = any_tet ? (Δ-support) : 1
which equals the reference's masked ``where(tet_nz, x'+Δ, 0)`` exactly
(padded slots produce all-zero one-hot rows, hence zero chir and zero
gradients).  ``any_tet`` arrives as a (1, 1) scalar input because the
reference zeroes all non-center atoms only when ANY center exists in
the batch.

Only the both-features-on variant is fused (BASELINE.json config 3);
charges-only / stereo-only runs keep the unfused per-layer path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bin_mp import (
    _adj_group_spec,
    _agg_bwd,
    _agg_fwd,
    _bwd_from_saved,
    _const_spec,
    _fwd_math,
    _grad_shape_of,
    _lane_spec,
    _pick_group,
    _prep_layer,
    _seed_args,
    _unprep_layer_grads,
)


def inject_fused_enabled() -> str | None:
    """Policy: fuse the config-3 inject path into the per-layer kernel.
    Default follows the megakernel mode; ``AIMNET_INJECT_FUSED=0``
    disables (falls back to the round-3/4 XLA-inject path),
    ``=interpret`` forces the interpreter (CPU tests)."""
    env = os.environ.get("AIMNET_INJECT_FUSED", "").lower()
    if env in ("0", "off", "false"):
        return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu":
        return "tpu"
    if env in ("1", "on", "true"):
        return "interpret"
    return None


def _pick_group_inject(nb, ab, D, n_blocks, itemsize, bwd, dropout, tc):
    """Group size for the inject layer: the MP model plus the extra
    per-lane rows of the second int8 adjacency + int8 pool matrix
    (≈ (ab+mb)/itemsize row-equivalents) and the per-bin tet working set
    (~12 fp32 (D, Tc) arrays ≈ 48·D·Tc/ab extra rows).
    ``AIMNET_INJECT_GROUP_FWD/_BWD`` overrides without touching the MP
    kernels' knobs."""
    env = os.environ.get(
        "AIMNET_INJECT_GROUP_BWD" if bwd else "AIMNET_INJECT_GROUP_FWD"
    )
    if env:
        G = max(1, int(env))
        G = min(G, nb)
        while nb % G:
            G -= 1
        return G
    extra = D + 3 + (3 * ab) // max(1, itemsize) + (48 * D * tc) // ab
    return _pick_group(
        nb, ab, D, 1, n_blocks, itemsize, bwd, dropout, extra_rows=extra
    )


def _f32dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot00(a, b):  # contract dim 0 of both
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot11(a, b):  # contract dim 1 of both
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.lru_cache(maxsize=8)
def _make_inject_layer_op(act, n_blocks, dtype_name, interpret, dropout):
    """Custom-VJP op: ``f(xT, tc2, pool, tcols, anyt, sadj, adj, seed,
    kb, b_st, *layer_ws)`` → (D, A) layer output WITH the residual.

    xT (D, A) compute dtype (differentiable); tc2 (nb, mb) fp32 per-slot
    total charges; pool (nb, mb, ab) int8; tcols (nb, 4, Tc) int32
    per-bin tet tables (-1 padding); anyt (1, 1) fp32 ∈ {0, 1};
    sadj/adj (nb, ab, ab) int8; kb (3D, D) fp32 stereo projection;
    b_st (D,) fp32; layer_ws one layer's flat fp32 tuple in
    ``binned_mp_layer`` order (all weights differentiable)."""
    dt = jnp.dtype(dtype_name)
    n_w = 4 + 4 * n_blocks  # prepped layer weights

    def _drop_ctx(seed_ref, lanes):
        if dropout == 0.0:
            return None
        lane_off = jnp.uint32(pl.program_id(0)) * jnp.uint32(lanes)
        return (dropout, jnp.uint32(seed_ref[0]), 0, lane_off)

    # ---------------- charge equilibration (Q3), full group ------------ #

    def _charge_fwd(x, tca, pool):
        """x (D, W); tca (1, W) f32 per-ATOM total charge (each atom
        carries its molecule's value — Mosaic block shapes want lane
        arrays, and the per-atom form equals the per-molecule mapping
        exactly since the pool matrix is 0/1); pool (G, mb, ab) int8.
        Returns (x', saved) with x' = [q_new ‖ f_new ‖ x[2:]]; numerics
        mirror models/gnn.py::_charge_rows_t exactly."""
        G, mb, ab = pool.shape
        q = x[0:1].astype(jnp.float32)
        f0 = jnp.clip(x[1:2].astype(jnp.float32), min=1e-6)
        qn_parts, fn_parts, saved = [], [], []
        for g in range(G):
            poolf = pool[g].astype(jnp.float32)  # (mb, ab)
            qg = jax.lax.slice_in_dim(q, g * ab, (g + 1) * ab, axis=1)
            fg = jax.lax.slice_in_dim(f0, g * ab, (g + 1) * ab, axis=1)
            tg = jax.lax.slice_in_dim(tca, g * ab, (g + 1) * ab, axis=1)
            QFq = _dot11(qg, poolf)  # (1, mb)
            QFf = _dot11(fg, poolf)
            F_u = jnp.clip(QFf + 1e-6, min=1e-6)
            invF = 1.0 / F_u
            invF_atom = _f32dot(invF, poolf)  # (1, ab)
            dQ_atom = tg - _f32dot(QFq, poolf)  # (1, ab)
            f_new = fg * invF_atom
            q_new = qg + f_new * dQ_atom
            qn_parts.append(q_new)
            fn_parts.append(f_new)
            saved.append((poolf, fg, F_u, invF_atom, dQ_atom, f_new))
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
        xp = jnp.concatenate(
            [cat(qn_parts).astype(dt), cat(fn_parts).astype(dt), x[2:]], axis=0
        )
        return xp, saved

    def _charge_bwd(x, saved, dxp32, ab):
        """Route dxp32 rows 0/1 back through the equilibration; rows 2+
        pass straight through.  Returns the full dx (D, W) fp32."""
        dq_parts, df_parts = [], []
        for g, (poolf, fg, F_u, invF_atom, dQ_atom, f_new) in enumerate(saved):
            dqn = jax.lax.slice_in_dim(dxp32[0:1], g * ab, (g + 1) * ab, axis=1)
            dfn1 = jax.lax.slice_in_dim(dxp32[1:2], g * ab, (g + 1) * ab, axis=1)
            # q_new = q + f_new·dQ_atom ; f_new = f0·invF_atom
            df_new = dfn1 + dqn * dQ_atom
            d_dQ_atom = dqn * f_new
            d_invF_atom = df_new * fg
            df0 = df_new * invF_atom
            # dQ_atom = tca − QFq@pool ; invF = 1/F_u ;
            # F_u = clip(QFf+1e-6, 1e-6)
            d_QFq = -_dot11(d_dQ_atom, poolf)  # (1, mb)
            d_invF = _dot11(d_invF_atom, poolf)
            d_F = -d_invF / (F_u * F_u)
            d_QFf = d_F  # clip lower bound never binds (QFf ≥ 0)
            dq = dqn + _f32dot(d_QFq, poolf)  # (1, ab)
            df0 = df0 + _f32dot(d_QFf, poolf)
            dq_parts.append(dq)
            df_parts.append(df0)
        cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
        # f0 = clip(f, min=1e-6): the clamp BINDS wherever the raw row-1
        # activation sits below 1e-6 (about half of a centered activation
        # distribution!) and autodiff gives those entries ZERO gradient
        df = jnp.where(
            x[1:2].astype(jnp.float32) >= 1e-6, cat(df_parts), 0.0
        )
        return jnp.concatenate([cat(dq_parts), df, dxp32[2:]], axis=0)

    # ---------------- tetrahedral polynomial (Q6), per bin ------------- #

    def _tet_fwd_bin(xg, tcols_g, anyt, keep=False):
        """tet part for one bin: xg (D, ab) dt; tcols_g (4, Tc) int32;
        anyt (1, 1) fp32.  Returns (tet_g, saved).

        One-hots are built TRANSPOSED, ohT (ab, Tc): every construction
        stays 2-D (no 1-D slices/reshapes, which Mosaic lowers poorly) —
        ohT[a, t] = (a == col[t]) via a dim-0 iota against the (1, Tc)
        row slice of the table."""
        D, ab = xg.shape
        tc = tcols_g.shape[1]
        ohs, es = [], []
        io = jax.lax.broadcasted_iota(jnp.int32, (ab, tc), 0)
        for k in range(4):
            col = jax.lax.slice(tcols_g, (k, 0), (k + 1, tc))  # (1, Tc)
            ohT = ((io == col) & (col >= 0)).astype(dt)  # (ab, Tc)
            ohs.append(ohT)
            es.append(_f32dot(xg, ohT))  # (D, ab)@(ab, Tc) → (D, Tc) fp32
        mags = [jnp.sqrt(jnp.sum(e * e, axis=0, keepdims=True)) for e in es]
        mclips = [jnp.maximum(m, 1e-8) for m in mags]
        eNs = [e / mc for e, mc in zip(es, mclips)]
        sqs = [eN * eN for eN in eNs]
        u = (mags[0] + mags[1] + mags[2] + mags[3]) * (1.0 / 12.0)
        scale = jnp.tanh(u) * anyt  # (1, Tc); anyt broadcasts from (1, 1)
        Ps, chirs = [], []
        for k in range(4):
            a1, a2, a3 = (k + 1) % 4, (k + 2) % 4, (k + 3) % 4
            P = (
                sqs[a1] * (eNs[a2] - eNs[a3])
                + sqs[a2] * (eNs[a3] - eNs[a1])
                + sqs[a3] * (eNs[a1] - eNs[a2])
            )
            Ps.append(P)
            chirs.append(P * scale)
        delta32 = None
        ones_row = jnp.ones((1, tc), jnp.float32)
        colcount = None
        for k in range(4):
            d = _dot11(chirs[k], ohs[k])  # (D, Tc)·(ab, Tc)ᵀ → (D, ab)
            delta32 = d if delta32 is None else delta32 + d
            c = _dot11(ones_row, ohs[k].astype(jnp.float32))  # (1, ab)
            colcount = c if colcount is None else colcount + c
        nz = (colcount > 0).astype(jnp.float32)  # (1, ab)
        m = (anyt * nz + (1.0 - anyt)).astype(dt)
        tet_g = (xg + delta32.astype(dt)) * m
        saved = (ohs, es, mags, mclips, eNs, sqs, scale, Ps, m) if keep else None
        return tet_g, saved

    def _tet_bwd_bin(xg, saved, dtet_g, anyt):
        """dxg (D, ab) fp32 from one bin's tet cotangent (fp32)."""
        ohs, es, mags, mclips, eNs, sqs, scale, Ps, m = saved
        m32 = m.astype(jnp.float32)
        dxg = dtet_g * m32  # direct x' path
        dDelta = dtet_g * m32  # cast grad is identity
        # delta = chir @ ohTᵀ ⇒ dchir = dΔ @ ohT
        dchirs = [_f32dot(dDelta, oh.astype(jnp.float32)) for oh in ohs]
        dscale = None
        dPs = []
        for k in range(4):
            dP = dchirs[k] * scale
            dPs.append(dP)
            s = jnp.sum(dchirs[k] * Ps[k], axis=0, keepdims=True)
            dscale = s if dscale is None else dscale + s
        d_eN = [jnp.zeros_like(eNs[0]) for _ in range(4)]
        d_sq = [jnp.zeros_like(sqs[0]) for _ in range(4)]
        for k in range(4):
            a1, a2, a3 = (k + 1) % 4, (k + 2) % 4, (k + 3) % 4
            dP = dPs[k]
            d_sq[a1] = d_sq[a1] + dP * (eNs[a2] - eNs[a3])
            d_sq[a2] = d_sq[a2] + dP * (eNs[a3] - eNs[a1])
            d_sq[a3] = d_sq[a3] + dP * (eNs[a1] - eNs[a2])
            d_eN[a2] = d_eN[a2] + dP * sqs[a1]
            d_eN[a3] = d_eN[a3] - dP * sqs[a1]
            d_eN[a3] = d_eN[a3] + dP * sqs[a2]
            d_eN[a1] = d_eN[a1] - dP * sqs[a2]
            d_eN[a1] = d_eN[a1] + dP * sqs[a3]
            d_eN[a2] = d_eN[a2] - dP * sqs[a3]
        # scale = tanh(Σ mags / 12)·anyt
        du = dscale * (1.0 - jnp.tanh(
            (mags[0] + mags[1] + mags[2] + mags[3]) * (1.0 / 12.0)
        ) ** 2) * anyt * (1.0 / 12.0)
        for k in range(4):
            d_eN_k = d_eN[k] + 2.0 * eNs[k] * d_sq[k]
            d_e = d_eN_k / mclips[k]
            dmclip = -jnp.sum(d_eN_k * eNs[k], axis=0, keepdims=True) / mclips[k]
            dmags = jnp.where(mags[k] >= 1e-8, dmclip, 0.0) + du
            d_e = d_e + dmags * eNs[k]
            # e = xg @ ohT ⇒ dxg = d_e @ ohTᵀ
            dxg = dxg + _dot11(d_e, ohs[k].astype(jnp.float32))
        return dxg

    # ---------------- fused forward / backward kernels ----------------- #

    def _inject_fwd(x, tca, pool, tcols, anyt, sadjg, k0, k1, k2, bst,
                    keep=False):
        G, _, ab = sadjg.shape[0], 0, sadjg.shape[1]
        xp, ch_saved = _charge_fwd(x, tca, pool)
        cct = xp + _agg_fwd(xp, sadjg, dt).astype(dt)
        tet_parts, tet_saved = [], []
        for g in range(G):
            xg = jax.lax.slice_in_dim(xp, g * ab, (g + 1) * ab, axis=1)
            tg, sv = _tet_fwd_bin(xg, tcols[g], anyt, keep=keep)
            tet_parts.append(tg)
            tet_saved.append(sv)
        tet = (
            tet_parts[0] if G == 1 else jnp.concatenate(tet_parts, axis=1)
        )
        pre32 = _dot00(k0, xp) + _dot00(k1, cct) + _dot00(k2, tet)
        pre = pre32.astype(dt) + bst
        return xp, ch_saved, cct, tet, tet_saved, pre

    def fwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        (x_ref, tca_ref, pool_ref, tcols_ref, anyt_ref, sadj_ref, adj_ref,
         *rest) = refs[1 if dropout else 0 :]
        k0_ref, k1_ref, k2_ref, bst_ref = rest[:4]
        lws = tuple(r[...] for r in rest[4 : 4 + n_w])
        out_ref = rest[4 + n_w]
        x = x_ref[...]
        anyt = anyt_ref[...]  # (1, 1) — broadcasts; no scalar extraction
        _, _, _, _, _, pre = _inject_fwd(
            x, tca_ref[...], pool_ref[...], tcols_ref[...], anyt,
            sadj_ref[...], k0_ref[...], k1_ref[...], k2_ref[...], bst_ref[...],
        )
        y = _fwd_math(
            pre, adj_ref[...], lws, act, n_blocks, dt,
            drop=_drop_ctx(seed_ref, x.shape[-1]),
        )
        out_ref[...] = y + pre  # residual in-kernel (gnn.py:302-306)

    def bwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        (x_ref, tca_ref, pool_ref, tcols_ref, anyt_ref, sadj_ref, adj_ref,
         *rest) = refs[1 if dropout else 0 :]
        k0_ref, k1_ref, k2_ref, bst_ref = rest[:4]
        lws = tuple(r[...] for r in rest[4 : 4 + n_w])
        g_ref = rest[4 + n_w]
        (dx_ref, dkb_ref, dbst_ref, *lgrad_refs) = rest[5 + n_w :]
        x = x_ref[...]
        anyt = anyt_ref[...]  # (1, 1)
        sadjg = sadj_ref[...]
        adjg = adj_ref[...]
        tcols = tcols_ref[...]
        k0, k1, k2 = k0_ref[...], k1_ref[...], k2_ref[...]
        drop = _drop_ctx(seed_ref, x.shape[-1])
        xp, ch_saved, cct, tet, tet_saved, pre = _inject_fwd(
            x, tca_ref[...], pool_ref[...], tcols, anyt, sadjg,
            k0, k1, k2, bst_ref[...], keep=True,
        )
        _, saved = _fwd_math(
            pre, adjg, lws, act, n_blocks, dt, keep=True, grad_only=True,
            drop=drop,
        )
        g = g_ref[...]
        dlayer32, lwgrads = _bwd_from_saved(
            pre, adjg, lws, g.astype(dt), saved, act, n_blocks, dt, drop=drop
        )
        dpre32 = dlayer32 + g.astype(jnp.float32)  # + residual path
        dpre = dpre32.astype(dt)
        d_k0 = _dot11(xp, dpre)
        d_k1 = _dot11(cct, dpre)
        d_k2 = _dot11(tet, dpre)
        d_bst = jnp.sum(dpre32, axis=1, keepdims=True)
        dtet32 = _f32dot(k2, dpre)
        dcct32 = _f32dot(k1, dpre)
        dxp32 = (
            _f32dot(k0, dpre) + dcct32 + _agg_bwd(dcct32, sadjg, dt)
        )
        G, ab, _ = sadjg.shape
        dxp_tet_parts = []
        for gbin in range(G):
            xg = jax.lax.slice_in_dim(xp, gbin * ab, (gbin + 1) * ab, axis=1)
            dtg = jax.lax.slice_in_dim(
                dtet32, gbin * ab, (gbin + 1) * ab, axis=1
            )
            dxp_tet_parts.append(
                _tet_bwd_bin(xg, tet_saved[gbin], dtg, anyt)
            )
        dxp32 = dxp32 + (
            dxp_tet_parts[0]
            if G == 1
            else jnp.concatenate(dxp_tet_parts, axis=1)
        )
        dx32 = _charge_bwd(x, ch_saved, dxp32, ab)
        dx_ref[...] = dx32.astype(dx_ref.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dkb_ref[...] = jnp.zeros_like(dkb_ref)
            dbst_ref[...] = jnp.zeros_like(dbst_ref)
            for r in lgrad_refs:
                r[...] = jnp.zeros_like(r)

        dkb_ref[...] += jnp.concatenate([d_k0, d_k1, d_k2], axis=0)
        dbst_ref[...] += d_bst
        for r, wg in zip(lgrad_refs, lwgrads):
            r[...] += wg

    # ---------------- pallas_call plumbing ----------------------------- #

    def _prep(kb_f32, bst_f32, lws_f32):
        D = kb_f32.shape[1]
        return (
            kb_f32[:D].astype(dt),
            kb_f32[D : 2 * D].astype(dt),
            kb_f32[2 * D :].astype(dt),
            bst_f32.astype(dt).reshape(-1, 1),
        ) + _prep_layer(lws_f32, dt)

    def _data_specs(G, mb, ab, tc, D_lanes):
        return [
            _lane_spec(1, D_lanes),
            pl.BlockSpec(
                (G, mb, ab), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, 4, tc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _adj_group_spec(G, ab),
            _adj_group_spec(G, ab),
        ]

    def forward(xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32,
                bst_f32, *lws_f32):
        D, A = xT.shape
        nb, ab, _ = adj.shape
        mb = pool.shape[1]
        tc = tcols.shape[2]
        ws = _prep(kb_f32, bst_f32, lws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group_inject(nb, ab, D, n_blocks, dt.itemsize, False,
                               dropout, tc)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(D, G * ab),
                *_data_specs(G, mb, ab, tc, G * ab),
                *[_const_spec(w.shape) for w in ws],
            ],
            out_specs=_lane_spec(D, G * ab),
            out_shape=jax.ShapeDtypeStruct((D, A), xT.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * A * (2 * ab * D + sum(w.size for w in ws if w.shape[1] > 1)),
                bytes_accessed=xT.size * xT.dtype.itemsize * 3,
                transcendentals=A * D,
            ),
            interpret=interpret,
        )(*seed_vals, xT, tca, pool, tcols, anyt, sadj, adj, *ws)

    def backward_call(res, gT):
        (xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32, bst_f32,
         lws_f32) = res
        D, A = xT.shape
        nb, ab, _ = adj.shape
        mb = pool.shape[1]
        tc = tcols.shape[2]
        ws = _prep(kb_f32, bst_f32, lws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group_inject(nb, ab, D, n_blocks, dt.itemsize, True,
                               dropout, tc)
        lw_shapes = [
            jax.ShapeDtypeStruct(_grad_shape_of(w), jnp.float32) for w in ws[4:]
        ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(D, G * ab),
                *_data_specs(G, mb, ab, tc, G * ab),
                *[_const_spec(w.shape) for w in ws],
                _lane_spec(D, G * ab),
            ],
            out_specs=[
                _lane_spec(D, G * ab),
                _const_spec(kb_f32.shape),
                _const_spec((D, 1)),
                *[_const_spec(sh.shape) for sh in lw_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((D, A), xT.dtype),
                jax.ShapeDtypeStruct(kb_f32.shape, jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                *lw_shapes,
            ],
            interpret=interpret,
        )(*seed_vals, xT, tca, pool, tcols, anyt, sadj, adj, *ws, gT)
        dx, d_kb, d_bst = outs[:3]
        lgrads = _unprep_layer_grads(lws_f32, outs[3:])
        return dx, d_kb, d_bst.reshape(bst_f32.shape), lgrads

    @jax.custom_vjp
    def op(xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32, bst_f32,
           *lws_f32):
        return forward(xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32,
                       bst_f32, *lws_f32)

    def op_fwd(xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32, bst_f32,
               *lws_f32):
        out = forward(xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32,
                      bst_f32, *lws_f32)
        return out, (xT, tca, pool, tcols, anyt, sadj, adj, seed, kb_f32,
                     bst_f32, lws_f32)

    def op_bwd(res, g):
        dx, d_kb, d_bst, lgrads = backward_call(res, g)
        seed = res[7]
        return (
            dx, None, None, None, None, None, None, jnp.zeros_like(seed),
            d_kb, d_bst, *lgrads,
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_inject_mp_layer_t(
    xT,
    total_charge_atom,
    pool_mat,
    tet_bin,
    any_tet,
    stereo_adj,
    bin_adj,
    stereo_kb,
    stereo_b,
    layer_ws,
    *,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
):
    """One fully-fused charge+stereo inject → shell-conv layer → residual
    round, feature-major (see module docstring).  Returns the NEXT xT
    (D, A).  ``total_charge_atom`` is the (A,) per-ATOM total-charge map
    (each atom carries its molecule's value; padding atoms 0 — the
    caller computes it ONCE per batch); ``any_tet`` a scalar."""
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_inject_layer_op(
        act, num_mlp_layers, dt.name, interpret, float(dropout)
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    anyt = jnp.asarray(any_tet, jnp.float32).reshape(1, 1)
    return op(
        xT.astype(dt),
        total_charge_atom.astype(jnp.float32).reshape(1, -1),
        pool_mat,
        tet_bin.astype(jnp.int32),
        anyt,
        stereo_adj,
        bin_adj,
        seed,
        stereo_kb,
        stereo_b,
        *layer_ws,
    )
