"""Fused charge-equilibration + stereochemistry + shell-conv layer kernel.

BASELINE.json config 3 (``--use_partial_charges --use_stereochemistry``)
ran 183.7 ms/step at 32k molecules vs the flagship's 46.7 (round-4
measurement): the per-layer charge/stereo injections executed as XLA
between single-layer MP megakernels, and because the kernels are opaque
to XLA fusion, every inject stage materialized its (D, A)-scale
intermediate to HBM — the charge-equilibrated copy of xT, the cis/trans
``cct`` array, the masked tetrahedral array, and the stereo projection
output, each ~200 MB at the 32k flagship shape, re-read by the next
stage, and re-traversed by autodiff in the backward.

This op folds one full inject→layer round into ONE pallas_call per
direction (reference semantics: charge equilibration gnn.py:622-658,
stereo features gnn.py:310-509, shell conv layers.py:63-167 under Q1):

    x'   = [q_new ‖ f_new ‖ x[2:]]        (charge rows overlaid — the
                                           (2, A) rows are computed in
                                           XLA from per-molecule sums,
                                           tiny, and passed in)
    cct  = x' + x' @ S        per bin     (signed cis/trans adjacency,
                                           int8, trans +1 / cis −1 — the
                                           dense form of Q6's scatters
                                           with Q7's duplication baked
                                           into the multiplicities)
    pre  = k0ᵀx' + k1ᵀcct + k2ᵀ(x'·m) + b + corr
                                          (stereo projection; m masks
                                           non-tetrahedral columns, corr
                                           carries the k2-projected
                                           tetrahedral polynomial —
                                           computed compactly in XLA
                                           from the (C, 4, D) gather,
                                           which autodiff handles)
    out  = shell_conv(pre) + pre          (in-kernel layer + residual)

so per layer the only (D, A)-scale HBM traffic is xT in, corr in, the
two int8 adjacencies, and out — everything else lives in VMEM.  The
custom VJP recomputes the chain per bin group (same remat rationale as
ops/bin_mp.py) and emits dxT, dqf, dcorr plus fp32 weight grads; the
tetrahedral polynomial's own gradient flows through XLA autodiff of the
compact corr construction outside the op.

The tetrahedral split is exact algebra: with m = any_tet ? tet_nz : 1
and Δ supported only on tet_nz columns,
    k2ᵀ·where(any_tet, tet_nz·(x'+Δ), x') = k2ᵀ(x'·m) + [any_tet]·k2ᵀΔ,
the second term being ``corr``.  Cast points follow the unfused path
(fp32 MXU accumulation → compute-dtype cast → dt adds); the corr term
adds one extra rounding boundary vs the XLA path's single fused fp32
sum — reassociation-level, covered by the bf16 parity tolerance
(benchmarks/tpu_kernel_parity.py gates it on the real chip).

Only the both-features-on variant is fused (BASELINE.json config 3);
charges-only / stereo-only runs keep the unfused per-layer path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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


def _pick_group_inject(nb, ab, D, n_blocks, itemsize, bwd, dropout):
    """Group size for the inject layer: the MP model plus the extra
    per-lane rows (corr D, qf 2, m 1) and the second int8 adjacency
    (≈ ab/itemsize row-equivalents).  ``AIMNET_INJECT_GROUP_FWD/_BWD``
    overrides without touching the MP kernels' knobs."""
    env = os.environ.get(
        "AIMNET_INJECT_GROUP_BWD" if bwd else "AIMNET_INJECT_GROUP_FWD"
    )
    if env:
        G = max(1, int(env))
        G = min(G, nb)
        while nb % G:
            G -= 1
        return G
    extra = D + 3 + (2 * ab) // max(1, itemsize)
    return _pick_group(
        nb, ab, D, 1, n_blocks, itemsize, bwd, dropout, extra_rows=extra
    )


@functools.lru_cache(maxsize=8)
def _make_inject_layer_op(act, n_blocks, dtype_name, interpret, dropout):
    """Custom-VJP op: ``f(xT, qf, corrT, m, sadj, adj, seed, kb, b_st,
    *layer_ws)`` → (D, A) layer output WITH the residual applied.

    xT (D, A) compute dtype; qf (2, A) charge-equilibrated rows 0/1;
    corrT (D, A) tetrahedral correction (k2-projected, masked, compute
    dtype); m (1, A) tet column mask (compute dtype, non-diff);
    sadj/adj (nb, ab, ab) int8 (non-diff); kb (3D, D) fp32 stereo
    projection; b_st (D,) fp32; layer_ws one layer's flat fp32 tuple in
    ``binned_mp_layer`` order."""
    dt = jnp.dtype(dtype_name)
    n_w = 4 + 4 * n_blocks  # prepped layer weights

    def _drop_ctx(seed_ref, lanes):
        if dropout == 0.0:
            return None
        lane_off = jnp.uint32(pl.program_id(0)) * jnp.uint32(lanes)
        return (dropout, jnp.uint32(seed_ref[0]), 0, lane_off)

    def _inject_fwd(x, qf, corr, mrow, sadjg, k0, k1, k2, bst):
        """(x', cct, xpm, pre) for one lane-packed group — the fused
        forward of the charge overlay + stereo projection."""
        xp = jnp.concatenate([qf, x[2:]], axis=0)
        cct = xp + _agg_fwd(xp, sadjg, dt).astype(dt)
        xpm = xp * mrow
        pre32 = (
            jax.lax.dot_general(
                k0, xp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                k1, cct, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                k2, xpm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        pre = pre32.astype(dt) + bst + corr
        return xp, cct, xpm, pre

    def fwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        (x_ref, qf_ref, corr_ref, m_ref, sadj_ref, adj_ref, *rest) = refs[
            1 if dropout else 0 :
        ]
        k0_ref, k1_ref, k2_ref, bst_ref = rest[:4]
        lws = tuple(r[...] for r in rest[4 : 4 + n_w])
        out_ref = rest[4 + n_w]
        x = x_ref[...]
        _, _, _, pre = _inject_fwd(
            x, qf_ref[...], corr_ref[...], m_ref[...], sadj_ref[...],
            k0_ref[...], k1_ref[...], k2_ref[...], bst_ref[...],
        )
        y = _fwd_math(
            pre, adj_ref[...], lws, act, n_blocks, dt,
            drop=_drop_ctx(seed_ref, x.shape[-1]),
        )
        out_ref[...] = y + pre  # residual in-kernel (gnn.py:302-306)

    def bwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        (x_ref, qf_ref, corr_ref, m_ref, sadj_ref, adj_ref, *rest) = refs[
            1 if dropout else 0 :
        ]
        k0_ref, k1_ref, k2_ref, bst_ref = rest[:4]
        lws = tuple(r[...] for r in rest[4 : 4 + n_w])
        g_ref = rest[4 + n_w]
        (dx_ref, dqf_ref, dcorr_ref, dkb_ref, dbst_ref, *lgrad_refs) = rest[
            5 + n_w :
        ]
        x = x_ref[...]
        mrow = m_ref[...]
        sadjg = sadj_ref[...]
        adjg = adj_ref[...]
        k0, k1, k2 = k0_ref[...], k1_ref[...], k2_ref[...]
        drop = _drop_ctx(seed_ref, x.shape[-1])
        xp, cct, xpm, pre = _inject_fwd(
            x, qf_ref[...], corr_ref[...], mrow, sadjg, k0, k1, k2,
            bst_ref[...],
        )
        # layer recompute (grad_only: skip-proj / final-block matmuls are
        # never read by the walk) + backward walk to dpre
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
        dcorr_ref[...] = dpre.astype(dcorr_ref.dtype)
        # stereo projection backward (orientation: pre += kᵀ·p ⇒
        # d_k = p @ dpreᵀ, dp = k @ dpre)
        d_k0 = jax.lax.dot_general(
            xp, dpre, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_k1 = jax.lax.dot_general(
            cct, dpre, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_k2 = jax.lax.dot_general(
            xpm, dpre, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_bst = jnp.sum(dpre32, axis=1, keepdims=True)
        dcct32 = jnp.dot(k1, dpre, preferred_element_type=jnp.float32)
        dxp32 = (
            jnp.dot(k0, dpre, preferred_element_type=jnp.float32)
            + jnp.dot(k2, dpre, preferred_element_type=jnp.float32)
            * mrow.astype(jnp.float32)
            + dcct32
            + _agg_bwd(dcct32, sadjg, dt)
        )
        dqf_ref[...] = dxp32[:2].astype(dqf_ref.dtype)
        # rows 0/1 of xT reach the output only through qf (XLA owns that
        # path); rows 2+ pass straight through the overlay
        dx_ref[...] = jnp.concatenate(
            [jnp.zeros_like(dxp32[:2]), dxp32[2:]], axis=0
        ).astype(dx_ref.dtype)

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

    def _prep(kb_f32, bst_f32, lws_f32):
        D = kb_f32.shape[1]
        return (
            kb_f32[:D].astype(dt),
            kb_f32[D : 2 * D].astype(dt),
            kb_f32[2 * D :].astype(dt),
            bst_f32.astype(dt).reshape(-1, 1),
        ) + _prep_layer(lws_f32, dt)

    def forward(xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, *lws_f32):
        D, A = xT.shape
        nb, ab, _ = adj.shape
        ws = _prep(kb_f32, bst_f32, lws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group_inject(nb, ab, D, n_blocks, dt.itemsize, False, dropout)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(D, G * ab),
                _lane_spec(2, G * ab),
                _lane_spec(D, G * ab),
                _lane_spec(1, G * ab),
                _adj_group_spec(G, ab),
                _adj_group_spec(G, ab),
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
        )(*seed_vals, xT, qf, corrT, m, sadj, adj, *ws)

    def backward_call(res, gT):
        xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, lws_f32 = res
        D, A = xT.shape
        nb, ab, _ = adj.shape
        ws = _prep(kb_f32, bst_f32, lws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group_inject(nb, ab, D, n_blocks, dt.itemsize, True, dropout)
        lw_shapes = [
            jax.ShapeDtypeStruct(_grad_shape_of(w), jnp.float32) for w in ws[4:]
        ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(D, G * ab),
                _lane_spec(2, G * ab),
                _lane_spec(D, G * ab),
                _lane_spec(1, G * ab),
                _adj_group_spec(G, ab),
                _adj_group_spec(G, ab),
                *[_const_spec(w.shape) for w in ws],
                _lane_spec(D, G * ab),
            ],
            out_specs=[
                _lane_spec(D, G * ab),
                _lane_spec(2, G * ab),
                _lane_spec(D, G * ab),
                _const_spec(kb_f32.shape),
                _const_spec((D, 1)),
                *[_const_spec(sh.shape) for sh in lw_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((D, A), xT.dtype),
                jax.ShapeDtypeStruct((2, A), qf.dtype),
                jax.ShapeDtypeStruct((D, A), corrT.dtype),
                jax.ShapeDtypeStruct(kb_f32.shape, jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                *lw_shapes,
            ],
            interpret=interpret,
        )(*seed_vals, xT, qf, corrT, m, sadj, adj, *ws, gT)
        dx, dqf, dcorr, d_kb, d_bst = outs[:5]
        lgrads = _unprep_layer_grads(lws_f32, outs[5:])
        return dx, dqf, dcorr, d_kb, d_bst.reshape(bst_f32.shape), lgrads

    @jax.custom_vjp
    def op(xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, *lws_f32):
        return forward(xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, *lws_f32)

    def op_fwd(xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, *lws_f32):
        out = forward(xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, *lws_f32)
        return out, (xT, qf, corrT, m, sadj, adj, seed, kb_f32, bst_f32, lws_f32)

    def op_bwd(res, g):
        dx, dqf, dcorr, d_kb, d_bst, lgrads = backward_call(res, g)
        seed = res[6]
        return (
            dx, dqf, dcorr, None, None, None, jnp.zeros_like(seed),
            d_kb, d_bst, *lgrads,
        )

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_inject_mp_layer_t(
    xT,
    qf,
    corrT,
    m,
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
    """One fused charge+stereo inject → shell-conv layer → residual round,
    feature-major (see module docstring).  Returns the NEXT xT (D, A)."""
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
    return op(
        xT.astype(dt),
        qf.astype(dt),
        corrT.astype(dt),
        m.astype(dt),
        stereo_adj,
        bin_adj,
        seed,
        stereo_kb,
        stereo_b,
        *layer_ws,
    )
