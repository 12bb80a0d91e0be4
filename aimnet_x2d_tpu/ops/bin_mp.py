"""Whole-MP-layer Pallas megakernel for the bin-packed dense layout.

Profiling the binned train step (BASELINE.md round 2, jax.profiler on TPU
v5e) shows the MP stack's time is NOT in its matmuls: XLA materializes
every (A, D) intermediate — bias adds, activations, dtype converts, MLP
residuals — as separate HBM-bound fusions, ~0.2-0.3 ms each, totalling
~15 ms of a 26.5 ms on-chip step at 8192 molecules.  The matmul floor for
the same stack is ~2.5 ms/layer-pass.

This kernel runs ONE shell-convolution layer (reference semantics:
src/models/layers.py:63-167 under quirk Q1 union-of-hops collapse) for one
256-atom bin entirely in VMEM:

    agg   = adj @ x                      (int8 multiplicity adjacency, MXU)
    h     = act(x @ Win0 + agg @ Win1 + b_in)
    skip  =     x @ Ws0  + agg @ Ws1  + b_skip
    L ×   : h = h + W2(act(W1 h + b1)) + b2      (per-block residual)
    out   = h + skip

so the only HBM traffic per layer is x in, adj in, weights (resident), and
out — all intermediates live and die in VMEM.

Transposed (feature-major) layout
---------------------------------
In-kernel activations are held FEATURE-MAJOR: xT (D, ab) instead of
(ab, D).  The MXU pads lane (minor) dimensions to 128 and sublane
dimensions only to the 8/16-row tile, so with the reference's
D = int(0.3·512) = 153 the row-major form pays 153→256 lane padding on
every D-column matmul (a D×D block matmul does 2.8× its real FLOPs).
Feature-major puts D on sublanes (153→160, 4%) and the 256-atom bin on
lanes (exact), cutting the stack's padded matmul volume ~1.6×.  Weights
are pre-transposed OUTSIDE the kernel (free, XLA folds it into the
weight-cast), and the (nb, ab, D) ↔ (nb, D, ab) activation transposes at
the kernel boundary are two cheap HBM-bandwidth XLA transposes — measured
~19% end-to-end step-time win at the flagship config.

The backward pass is a custom VJP whose kernel RECOMPUTES the forward
per-bin (rematerialization is free here: the recompute stays in VMEM) and
accumulates weight gradients across the sequential TPU grid into
constant-index output blocks (fp32).  Gradients match XLA autodiff of the
unfused path to bf16 tolerance (same bf16 rounding points, fp32 matmul
accumulation everywhere).  Saving intermediates to HBM instead would move
~5 GB/step at the flagship shape — the recompute is cheaper.

Numerics notes
- bf16 mode reproduces the unfused path's cast points exactly: fp32 MXU
  accumulation → bf16 cast → bf16 bias add (models/layers.py ``Linear`` /
  ``_proj``).
- Dropout runs in-kernel via a counter-based hash RNG keyed on GLOBAL
  (feature, atom) coordinates — fwd and bwd regenerate identical masks
  even at different bins-per-grid-step groupings.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def megakernel_enabled() -> str | None:
    """Policy switch: "tpu" (compiled), "interpret" (CPU tests), or None.

    Default: on for the TPU backend.  ``AIMNET_MP_MEGAKERNEL=0`` disables;
    ``=interpret`` forces the interpreter path off-TPU (used by tests to
    exercise the kernel math on CPU).
    """
    env = os.environ.get("AIMNET_MP_MEGAKERNEL", "").lower()
    if env in ("0", "off", "false"):
        return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu":
        return "tpu"
    if env in ("1", "on", "true"):
        return "interpret"
    return None


# --------------------------------------------------------------------- #
# Activations (value + derivative, computed in the input dtype; the
# derivative formulas match jax.grad of utils/activation.py exactly).
# --------------------------------------------------------------------- #


# All scalar constants below are explicitly dtyped: Mosaic rejects the
# weak-typed f32 literals XLA would silently demote (vector.broadcast
# f32 → bf16 verification error).


def _sigmoid(u):
    # hand-rolled: Mosaic's lax.logistic lowering broadcasts an f32
    # literal into bf16 vectors (verification error)
    one = jnp.asarray(1, u.dtype)
    return one / (one + jnp.exp(-u))


def _act_value(name, u):
    one = jnp.asarray(1, u.dtype)
    half = jnp.asarray(0.5, u.dtype)
    if name == "silu":
        return u * _sigmoid(u)
    if name == "relu":
        return jnp.maximum(u, jnp.asarray(0, u.dtype))
    if name == "leakyrelu":
        return jnp.where(u >= 0, u, jnp.asarray(0.01, u.dtype) * u)
    if name == "elu":
        return jnp.where(u > 0, u, jnp.expm1(u))
    if name == "gelu":  # exact (erf) formulation, torch default
        return half * u * (one + jax.lax.erf(u * jnp.asarray(0.7071067811865476, u.dtype)))
    raise ValueError(f"unsupported activation for megakernel: {name}")


def _act_value_aux(name, u):
    """Activation value + a reusable auxiliary (the transcendental part)
    so the backward walk can form the derivative WITHOUT re-evaluating
    exp — measured ~5 ms/step of pure VPU time at the 32k flagship batch
    (silu's exp dominates the kernels' non-MXU cost; relu A/B in
    BASELINE.md round 3)."""
    if name == "silu":
        s = _sigmoid(u)
        return u * s, s
    if name == "elu":
        v = jnp.where(u > 0, u, jnp.expm1(u))
        return v, v  # grad for u<=0 is exp(u) = value + 1
    if name == "gelu":
        one = jnp.asarray(1, u.dtype)
        cdf = jnp.asarray(0.5, u.dtype) * (
            one + jax.lax.erf(u * jnp.asarray(0.7071067811865476, u.dtype))
        )
        return u * cdf, cdf
    return _act_value(name, u), None


def _act_grad_aux(name, u, aux):
    """Derivative from the saved auxiliary (see _act_value_aux); falls
    back to the from-scratch formula when no aux was kept."""
    one = jnp.asarray(1, u.dtype)
    if aux is not None:
        if name == "silu":
            return aux * (one + u * (one - aux))
        if name == "elu":
            return jnp.where(
                u.astype(jnp.float32) > 0, one, aux + one
            )
        if name == "gelu":
            pdf = jnp.asarray(0.3989422804014327, u.dtype) * jnp.exp(
                jnp.asarray(-0.5, u.dtype) * u * u
            )
            return aux + u * pdf
    return _act_grad(name, u)


def _act_grad(name, u):
    one = jnp.asarray(1, u.dtype)
    if name == "silu":
        s = _sigmoid(u)
        return s * (one + u * (one - s))
    if name == "relu":
        # compare in fp32: Mosaic's bf16 predicate lowering is unsupported
        # on this target ("Target does not support this comparison")
        return (u.astype(jnp.float32) > 0).astype(u.dtype)
    if name == "leakyrelu":
        return jnp.where(
            u.astype(jnp.float32) >= 0, one, jnp.asarray(0.01, u.dtype)
        )
    if name == "elu":
        return jnp.where(u.astype(jnp.float32) > 0, one, jnp.exp(u))
    if name == "gelu":
        inv_sqrt2 = jnp.asarray(0.7071067811865476, u.dtype)
        cdf = jnp.asarray(0.5, u.dtype) * (one + jax.lax.erf(u * inv_sqrt2))
        pdf = jnp.asarray(0.3989422804014327, u.dtype) * jnp.exp(
            jnp.asarray(-0.5, u.dtype) * u * u
        )
        return cdf + u * pdf
    raise ValueError(name)


def _dot(a, b, out_dtype):
    """(m, k) @ (k, n) with fp32 MXU accumulation, cast to ``out_dtype``."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(out_dtype)


def _dot_c00(a, b):
    """Contract dim 0 of both operands (lhs-transposed matmul) — fp32."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_c11(a, b):
    """Contract dim 1 of both operands (rhs-transposed matmul) — fp32."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------- #
# In-kernel dropout: a counter-based hash (murmur3 finalizer over
# position ⊕ (seed, bin, layer, block) tags) instead of the TPU hardware
# PRNG — a pure function of indices, so the backward recompute regenerates
# the exact forward masks with no stream-order coupling, and the same code
# runs under the pallas interpreter on CPU (pltpu.prng_* has no CPU
# lowering).  Statistical quality of the fmix32 mixer is ample for
# dropout.  Note the mask stream necessarily differs from nn.Dropout's
# threefry stream (PARITY.md: statistically equivalent, not bit-equal).
# --------------------------------------------------------------------- #


def _dropout_mask(shape, rate, seed, tag, lane_off):
    """Boolean keep-mask: True with probability 1-rate.

    seed: uint32 scalar (traced); tag: (layer, block) mix; lane_off: the
    grid step's GLOBAL lane offset (traced) — masks are a pure function of
    (feature row, global atom column), so the forward and backward kernels
    regenerate identical masks even when they pack a different number of
    bins per grid step.
    """
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + lane_off
    x = (
        i * jnp.uint32(0x85EBCA6B)
        ^ j * jnp.uint32(0xC2B2AE35)
        ^ (seed + jnp.uint32(tag) * jnp.uint32(0x9E3779B9))
    )
    x ^= x >> jnp.uint32(16)
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> jnp.uint32(15)
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> jnp.uint32(16)
    # keep iff hash ≥ rate·2³²  (uniform over uint32)
    return x >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))


def _apply_dropout(v, rate, keep):
    scale = jnp.asarray(1.0 / (1.0 - rate), v.dtype)
    return jnp.where(keep, v * scale, jnp.asarray(0, v.dtype))


# --------------------------------------------------------------------- #
# Shared per-bin math, FEATURE-MAJOR: activations are (D, ab) — D on
# sublanes, atoms on lanes (see module docstring).  Pure jnp: the fwd/bwd
# kernel bodies call these, and tests can call them directly.
# --------------------------------------------------------------------- #


def _agg_fwd(xT, adjg, dt):
    """aggT (D, G·ab) fp32 for G bins packed along lanes: per-bin
    rhs-transposed matmuls against the block-diagonal (G, ab, ab)
    adjacency — the weight matmuls run at full G·ab width while the
    adjacency contraction never touches the zero off-bin blocks."""
    G, ab, _ = adjg.shape
    parts = [
        _dot_c11(
            jax.lax.slice_in_dim(xT, g * ab, (g + 1) * ab, axis=1).astype(dt),
            adjg[g].astype(dt),
        )
        for g in range(G)
    ]
    return parts[0] if G == 1 else jnp.concatenate(parts, axis=1)


def _agg_bwd(vT32, adjg, dt):
    """(v @ adj) in T-form for G packed bins: contract adj dim 0
    (dx[j] = Σ_i adj[i, j]·v[i]) per bin."""
    G, ab, _ = adjg.shape
    parts = [
        jnp.dot(
            jax.lax.slice_in_dim(vT32, g * ab, (g + 1) * ab, axis=1).astype(dt),
            adjg[g].astype(dt),
            preferred_element_type=jnp.float32,
        )
        for g in range(G)
    ]
    return parts[0] if G == 1 else jnp.concatenate(parts, axis=1)


def _fwd_math(xT, adjg, ws, act, n_blocks, dt, keep=False, drop=None,
              grad_only=False):
    """One shell-conv layer for G lane-packed bins, feature-major.

    xT: (D, G·ab); adjg: (G, ab, ab) neighbor multiplicities (agg = adj @ x
    per bin, so in T-form aggT[d, i] = Σ_j xT[d, j]·adj[i, j] — a
    rhs-transposed matmul, no explicit adjᵀ needed).  ``ws`` is the PREPPED
    per-layer weight tuple
    ``(w_inT (D,2D), b_inT (D,1), w_sT (D,2D), b_sT, [w1T,b1T,w2T,b2T]…)``
    (see ``_prep``): the input/skip projections contract over the
    concatenated ``[xT ‖ aggT]`` — one 2D-long contraction instead of two
    D-long ones.  fp32-accumulation reassociation is the only numerics
    difference vs the two-dot row-major form.  Returns outT
    (+ intermediates when ``keep`` for the backward recompute)."""
    aggT32 = _agg_fwd(xT, adjg, dt)
    xaT = jnp.concatenate([xT, aggT32.astype(dt)], axis=0)  # (2D, G·ab)
    return _fwd_math_xa(
        xaT, ws, act, n_blocks, dt, keep=keep, drop=drop, grad_only=grad_only
    )


def _fwd_math_xa(xaT, ws, act, n_blocks, dt, keep=False, drop=None,
                 grad_only=False):
    """Post-aggregation layer math on a precomputed xaT = [xT ‖ aggT]
    (2D, W).  Split out of :func:`_fwd_math` so the halo-partitioned mode
    (ops/halo.py) can compute the aggregation OUTSIDE the kernel — local
    per-bin matmuls overlapped with the boundary all_to_all — and feed the
    combined result in.

    ``grad_only`` (implies ``keep``): the caller only needs the saved
    intermediates for a backward walk, not the layer output — skip the
    skip-projection matmul and the final block's output matmul, neither of
    which the gradient walk consumes (round-4 recompute diet: ~31% of the
    recompute matmul FLOPs)."""
    w_inT, b_inT, w_sT, b_sT = ws[:4]
    tT = _dot(w_inT, xaT, dt) + b_inT
    h, t_aux = _act_value_aux(act, tT)
    sT = None if grad_only else _dot(w_sT, xaT, dt) + b_sT
    hs, us, vs, masks, auxs = [], [], [], [], []
    for i in range(n_blocks):
        w1T, b1T, w2T, b2T = ws[4 + 4 * i : 8 + 4 * i]
        u = _dot(w1T, h, dt) + b1T
        v, u_aux = _act_value_aux(act, u)
        if drop is not None:
            # reference block order: linear → act → dropout → linear
            rate, seed, base_tag, lane_off = drop
            m = _dropout_mask(
                v.shape, rate, seed, base_tag + jnp.uint32(i), lane_off
            )
            v = _apply_dropout(v, rate, m)
            if keep:
                masks.append(m)  # backward reuses instead of re-hashing
        if keep:
            hs.append(h)
            us.append(u)
            vs.append(v)  # post-dropout: d_w2 contracts against this
            auxs.append(u_aux)  # transcendental part (no exp in bwd)
        if grad_only and i == n_blocks - 1:
            h = None  # the walk never reads the layer output
        else:
            h = _dot(w2T, v, dt) + b2T + h
    if grad_only:
        return None, (xaT, tT, hs, us, vs, masks, t_aux, auxs)
    out = h + sT
    if keep:
        return out, (xaT, tT, hs, us, vs, masks, t_aux, auxs)
    return out


def _bwd_from_saved(xT, adjg, ws, g, saved, act, n_blocks, dt, drop=None):
    """Walk the layer chain backward from saved forward intermediates.

    g: (D, G·ab) upstream cotangent (compute dtype).  Returns (dxT fp32,
    per-weight fp32 grads — matrices in their ORIGINAL row-major
    orientation, biases as (D, 1) columns; ``_unprep_grads`` maps back)."""
    D = xT.shape[0]
    dxaT32, wgrads = _bwd_xa_from_saved(ws, g, saved, act, n_blocks, dt, drop)
    # xa = [x ‖ adj @ x]  ⇒ dxT = dxaT[:D] + dxaT[D:] @ adj (per bin)
    dx32 = dxaT32[:D] + _agg_bwd(dxaT32[D:], adjg, dt)
    return dx32, wgrads


def _bwd_xa_from_saved(ws, g, saved, act, n_blocks, dt, drop=None):
    """Backward walk down to the xa cotangent (2D, W) — the external-
    aggregation twin of :func:`_bwd_from_saved` (the caller owns the
    agg-transpose fold; here dxaT is returned whole)."""
    xaT, tT, hs, us, vs, masks, t_aux, auxs = saved
    w_inT, _, w_sT, _ = ws[:4]

    g = g.astype(dt)
    # out = h_L + s  ⇒ both branches see g
    d_ws = _dot_c11(xaT, g)  # (2D, D) fp32, original orientation
    d_bs = jnp.sum(g.astype(jnp.float32), axis=1, keepdims=True)  # (D, 1)
    dxaT32 = _dot_c00(w_sT, g)  # (2D, ab) fp32

    dh = g
    grads_blocks = []
    for i in range(n_blocks - 1, -1, -1):
        w1T, _, w2T, _ = ws[4 + 4 * i : 8 + 4 * i]
        # h_{i+1} = (act(h_i w1 + b1) w2 + b2) + h_i
        dw_out = dh  # grad at the w2-matmul output
        d_w2 = _dot_c11(vs[i], dw_out)  # (D_u, D_h) original orientation
        d_b2 = jnp.sum(dw_out.astype(jnp.float32), axis=1, keepdims=True)
        dv = _dot_c00(w2T, dw_out).astype(dt)  # (D_u, ab)
        if drop is not None:
            # dropout is linear: the same mask·scale maps dv̂ → dv
            dv = _apply_dropout(dv, drop[0], masks[i])
        du = dv * _act_grad_aux(act, us[i], auxs[i])
        d_w1 = _dot_c11(hs[i], du)  # (D_h, D_u) original orientation
        d_b1 = jnp.sum(du.astype(jnp.float32), axis=1, keepdims=True)
        dh = (dh.astype(jnp.float32) + _dot_c00(w1T, du)).astype(dt)
        grads_blocks.append((d_w1, d_b1, d_w2, d_b2))
    grads_blocks.reverse()

    dt_in = dh * _act_grad_aux(act, tT, t_aux)
    d_win = _dot_c11(xaT, dt_in)  # (2D, D) fp32, original orientation
    d_bin = jnp.sum(dt_in.astype(jnp.float32), axis=1, keepdims=True)
    dxaT32 = dxaT32 + _dot_c00(w_inT, dt_in)

    wgrads = [d_win, d_bin, d_ws, d_bs]
    for gb in grads_blocks:
        wgrads.extend(gb)
    return dxaT32, wgrads


# --------------------------------------------------------------------- #
# pallas_call wrappers
# --------------------------------------------------------------------- #


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM
    )


def _lane_spec(r, lanes):
    # lane-window block over a flat feature-major (r, A) array: grid
    # step i covers columns [i*lanes, (i+1)*lanes) — no reshapes or
    # transposes at the op boundary, so producers/consumers that also
    # speak feature-major chain with zero layout copies
    return pl.BlockSpec((r, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)


def _adj_group_spec(G, ab):
    # grid step i's G-bin slab of a (nb, ab, ab) block-diagonal adjacency
    return pl.BlockSpec((G, ab, ab), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _seed_args(seed, dropout):
    if dropout == 0.0:
        return [], []
    # the op-level seed arg is f32 bits (plain-zero VJP cotangent);
    # give the kernel int32 (SMEM loads are scalar-indexed)
    seed_i = jax.lax.bitcast_convert_type(seed, jnp.int32)
    return [pl.BlockSpec(memory_space=pltpu.SMEM)], [seed_i]


def _prep_layer(lw, dt):
    """Cast ONE layer's caller-facing fp32 weights
    ``(w_in0, w_in1, b_in, w_s0, w_s1, b_s, [w1, b1, w2, b2]…)`` to the
    feature-major compute form ``_fwd_math_xa`` consumes: the input/skip
    kernel pairs stacked into (D, 2D) matrices, all matrices transposed
    to (out, in), biases as (D, 1) columns."""
    w_in0, w_in1, b_in, w_s0, w_s1, b_s = lw[:6]
    out = [
        jnp.concatenate([w_in0, w_in1], axis=0).T.astype(dt),
        b_in.astype(dt).reshape(-1, 1),
        jnp.concatenate([w_s0, w_s1], axis=0).T.astype(dt),
        b_s.astype(dt).reshape(-1, 1),
    ]
    out.extend(
        w.T.astype(dt) if w.ndim == 2 else w.astype(dt).reshape(-1, 1)
        for w in lw[6:]
    )
    return tuple(out)


def _grad_shape_of(w):
    # kernel emits weight grads in ORIGINAL row-major orientation
    # (matrices: transpose of the prepped form; (D, 1) bias columns
    # keep their shape — biases are the shape[1] == 1 entries)
    return w.shape if w.shape[1] == 1 else (w.shape[1], w.shape[0])


def _unprep_layer_grads(lw, lg):
    """Map ONE layer's PREPPED-order fp32 grads back to caller order."""
    d_win, d_bin, d_ws, d_bs = lg[:4]
    D = lw[0].shape[1]
    out = [d_win[:D], d_win[D:], d_bin.reshape(lw[2].shape)]
    out += [d_ws[:D], d_ws[D:], d_bs.reshape(lw[5].shape)]
    out += [wg.reshape(orig.shape) for orig, wg in zip(lw[6:], lg[4:])]
    return out


def save_xs_enabled() -> bool:
    """Stack backward strategy (round 4): stream per-layer inputs to HBM
    in the forward so the backward runs a per-layer grad_only recompute —
    fewer matmuls, smaller VMEM footprint, larger bin groups.  Default ON;
    ``AIMNET_MP_SAVE_XS=0`` restores the round-3 full-chain recompute."""
    return os.environ.get("AIMNET_MP_SAVE_XS", "").lower() not in (
        "0", "off", "false"
    )


def stack_proj_enabled(train_mode: bool = True) -> bool:
    """Fold the x_other embedding-projection into the MP stack kernel
    (models/gnn.py feature-major path): default ON wherever the megakernel
    runs in TRAINING; ``AIMNET_MP_PROJ=0``/``=1`` overrides (parity tests
    toggle it).  Forward-only contexts (``train_mode=False``) default OFF —
    the fold's win is in the backward, and its extra Mosaic variants
    inflate eval/inference remote-compile time (see
    ops/bin_attnpool.py::attnpool_kernel_enabled)."""
    env = os.environ.get("AIMNET_MP_PROJ", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true", "interpret"):
        return True
    return train_mode


def _pick_group(nb, ab, D, n_layers, n_blocks, itemsize, bwd, dropout,
                extra_rows=0, wide=False, save_xs=False):
    """Bins per grid step.  Packing G bins along the lane axis turns the
    per-bin weight matmuls (n = ab lanes) into (n = G·ab) ones — per-issue
    MXU overhead dominates at n = 256, and grouping amortizes it — while
    the adjacency matmuls stay per-bin (the off-bin blocks are zero, so a
    full-width adjacency contraction would waste G× its FLOPs).  G is
    VMEM-budgeted: the backward's saved intermediates scale with G, so it
    typically gets a smaller group than the forward."""
    env = os.environ.get("AIMNET_MP_GROUP_BWD" if bwd else "AIMNET_MP_GROUP_FWD")
    if env:
        G = max(1, int(env))
    else:
        rows = 8 * D + extra_rows  # x, xa (2D), t/h/u/v/s working set
        if bwd:
            # saved intermediates incl. the act-aux arrays (sigmoid kept
            # from the recompute so the backward re-evaluates no exp).
            # save_xs: layer inputs come from HBM and the recompute runs
            # per layer inside the walk, so only ONE layer's saveds are
            # live at a time (plus the n_layers input windows).
            live_layers = 1 if save_xs else n_layers
            rows += live_layers * (4 + 4 * n_blocks) * D
            if save_xs:
                rows += n_layers * D  # streamed-in layer-input windows
            rows += 4 * D  # fp32 cotangent accumulators
        per_lane = rows * itemsize + ab  # + int8 adjacency column
        if dropout:
            per_lane += n_layers * n_blocks * D  # keep-masks
        # the model undercounts Mosaic stack temporaries ~2×.  The bwd
        # budget lands the flagship shape at G=4 (measured: 25.9 ms G=2 →
        # 23.5 ms G=4; G=8 regresses) — legal because backward only runs
        # inside the train step, whose jit carries the raised scoped-vmem
        # limit (trainer._tpu_compiler_options); forward also compiles in
        # default-limit contexts (init/eval), so its budget keeps G at
        # ~16 MB scoped.  AIMNET_MP_GROUP_FWD/BWD override.
        # ``wide``: the calling jit carries the raised scoped-vmem limit
        # (train step), so the forward can take a larger group than the
        # default-limit contexts (init/eval) allow.  The wide budget is
        # derived from the same knob the trainer passes to XLA
        # (AIMNET_SCOPED_VMEM_KIB) so the two stay co-tuned.
        if wide and not bwd:
            limit_kib = int(os.environ.get("AIMNET_SCOPED_VMEM_KIB", "49152"))
            budget = min(24, max(10, limit_kib // 2048)) * 2**20
        else:
            # bwd 17 MB keeps the flagship shape at G=4 after the act-aux
            # saves joined the per-layer intermediates (measured optimum;
            # G=2 regressed ~2.4 ms/step) — still well under the raised
            # scoped-vmem limit even at the ~2x undercount.
            budget = (17 if bwd else 10) * 2**20
        G = max(1, int(budget // (per_lane * ab)))
    # Forward cap 8 (was 16): the round-4 on-chip sweep measured G=8 as
    # the fastest forward group at the flagship shape (49.8 → 46.5 ms/step
    # at 32k together with the attnpool backward retune; BASELINE.md
    # round-4 table) — larger groups add VMEM pressure without widening
    # MXU issue.  The backward stays budget-limited (G=5 at the flagship).
    G = min(G, nb, 16 if bwd else 8)
    while nb % G:
        G -= 1
    return G


@functools.lru_cache(maxsize=32)
def _make_stack_op(act, n_blocks, n_layers, dtype_name, interpret, residual,
                   dropout=0.0, proj=False, vocab_sizes=None, wide=False,
                   save_xs=False):
    """Build the custom-VJP fused op for ``n_layers`` stacked shell-conv
    layers (static configuration).

    Signature of the returned fn: ``f(x3, adj, *ws)`` with x3 (nb, ab, D),
    adj (nb, ab, ab) int8, and ws the concatenation of every layer's flat
    weight tuple (fp32 masters; cast + transposed to the feature-major
    compute form inside the op).  With ``residual`` each layer applies
    ``x ← f(x) + x`` in-kernel (reference gnn.py:302-306) so inter-layer
    activations never touch HBM; without it (single-layer mode) the caller
    adds the residual.

    ``save_xs`` (round 4): the forward additionally streams each layer's
    INPUT activation to HBM (cheap: output DMAs pipeline under the
    MXU-bound grid) so the backward recomputes per layer in grad_only
    mode instead of re-running the whole chain — skipping every layer's
    skip-projection and final-block matmul (~31% of the recompute) and
    holding only ONE layer's intermediates in VMEM, which roughly doubles
    the legal bin group.  Numerics are bit-identical: the saved bf16
    values are exactly what the in-VMEM chain recompute produced.
    """
    dt = jnp.dtype(dtype_name)
    n_w = 4 + 4 * n_blocks  # PREPPED weights per layer (in/skip kernels fused)
    n_orig = 6 + 4 * n_blocks  # caller-facing weights per layer
    n_tot = n_w * n_layers
    # in-kernel x_other projection (kb, bb), optionally preceded by the
    # block-diag embedding table bd when the one-hot fold is on
    n_extra = (3 if vocab_sizes else 2) if proj else 0
    # save_xs HBM outputs: inputs to layers 1..L-1, plus layer 0's input
    # when it is produced in-kernel (proj mode) rather than passed in
    n_saved = ((n_layers - 1) + (1 if proj else 0)) if save_xs else 0

    def _layer_ws(rest, l):
        return tuple(
            r[...] for r in rest[n_extra + l * n_w : n_extra + (l + 1) * n_w]
        )

    def _proj_in(rest, x, with_act=True):
        """With ``proj``, x is the embedding array embT (E, G·ab) — or the
        stacked code rows (F, G·ab) int32 when ``vocab_sizes`` is set, in
        which case the embedding one-hot matmul (ops/embed.py semantics)
        runs here first.  Compute x₀ = act((kbᵀ @ emb).astype(dt) + bb) —
        same op sequence as models/gnn.py::_proj_rows_t.  Returns
        (oh, emb, t₀, x₀); ``with_act=False`` skips the activation (the
        save_xs backward reads x₀ back from HBM and only needs t₀)."""
        oh = None
        if vocab_sizes:
            from .embed import onehot_rows

            oh = onehot_rows(x, vocab_sizes, dt)  # (ΣV, G·ab)
            emb = jnp.dot(
                rest[0][...], oh, preferred_element_type=jnp.float32
            ).astype(dt)  # (E, G·ab)
            kbp, bbp = rest[1][...], rest[2][...]
        else:
            emb = x
            kbp, bbp = rest[0][...], rest[1][...]
        t0 = _dot_c00(kbp, emb).astype(dt) + bbp
        return oh, emb, t0, (_act_value(act, t0) if with_act else None)

    def _drop_ctx(seed_ref, l, lanes):
        # static (layer, block) tag base + the grid step's global lane
        # offset: mask identity is (feature, global atom) — grid-shape
        # independent, so fwd and bwd agree at different group sizes
        if dropout == 0.0:
            return None
        lane_off = jnp.uint32(pl.program_id(0)) * jnp.uint32(lanes)
        # int32 → uint32 is a value-preserving bit reinterpretation mod 2³²
        seed = jnp.uint32(seed_ref[0])
        return (dropout, seed, l * n_blocks, lane_off)

    def fwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        x_ref, adj_ref, *rest = refs[1 if dropout else 0 :]
        out_ref = rest[n_extra + n_tot]
        xs_refs = rest[n_extra + n_tot + 1 : n_extra + n_tot + 1 + n_saved]
        adj = adj_ref[...]  # (G, ab, ab) block-diagonal group
        x = x_ref[...]  # (D, G*ab) feature-major lane window (embT if proj)
        if proj:
            _, _, _, x = _proj_in(rest, x)
        for l in range(n_layers):
            si = l if proj else l - 1  # saved-input slot for layer l
            if save_xs and 0 <= si < n_saved:
                xs_refs[si][...] = x
            y = _fwd_math(
                x, adj, _layer_ws(rest, l), act, n_blocks, dt,
                drop=_drop_ctx(seed_ref, l, x.shape[-1]),
            )
            x = y + x if residual else y
        out_ref[...] = x

    def bwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        x_ref, adj_ref, *rest = refs[1 if dropout else 0 :]
        g_ref = rest[n_extra + n_tot]
        xs_in = rest[n_extra + n_tot + 1 : n_extra + n_tot + 1 + n_saved]
        base = n_extra + n_tot + 1 + n_saved
        if vocab_sizes:
            dx_ref = None  # codes carry no cotangent — no dx output
            grad_refs = rest[base:]
        else:
            dx_ref = rest[base]
            grad_refs = rest[base + 1 :]
        adj = adj_ref[...]
        x = x_ref[...]
        oh = emb = t0 = None
        if save_xs:
            # Layer inputs stream in from HBM: recompute each layer in
            # grad_only mode INSIDE the walk — no chain recompute, no
            # skip-projection/final-block matmuls, one layer's saveds
            # live at a time.
            if proj:
                oh, emb, t0, _ = _proj_in(rest, x, with_act=False)
            g32 = g_ref[...].astype(jnp.float32)
            wgrads_layers = [None] * n_layers
            for l in range(n_layers - 1, -1, -1):
                si = l if proj else l - 1
                xl = xs_in[si][...] if si >= 0 else x
                drop_l = _drop_ctx(seed_ref, l, g_ref.shape[-1])
                _, saved = _fwd_math(
                    xl, adj, _layer_ws(rest, l), act, n_blocks, dt,
                    keep=True, grad_only=True, drop=drop_l,
                )
                dx32, wgrads = _bwd_from_saved(
                    xl, adj, _layer_ws(rest, l), g32.astype(dt), saved,
                    act, n_blocks, dt, drop=drop_l,
                )
                g32 = dx32 + g32 if residual else dx32
                wgrads_layers[l] = wgrads
        else:
            # Recompute pass (stays in VMEM), keeping per-layer inputs and
            # intermediates so the backward walk costs no extra matmuls;
            # the LAST layer recomputes grad_only (its output is unused).
            if proj:
                oh, emb, t0, x = _proj_in(rest, x)
            xs, saveds = [], []
            for l in range(n_layers):
                last = l == n_layers - 1
                y, saved = _fwd_math(
                    x, adj, _layer_ws(rest, l), act, n_blocks, dt, keep=True,
                    grad_only=last, drop=_drop_ctx(seed_ref, l, x.shape[-1]),
                )
                xs.append(x)
                saveds.append(saved)
                if not last:
                    x = y + x if residual else y
            # Backward walk; the residual identity path keeps g in fp32.
            g32 = g_ref[...].astype(jnp.float32)
            wgrads_layers = [None] * n_layers
            for l in range(n_layers - 1, -1, -1):
                dx32, wgrads = _bwd_from_saved(
                    xs[l], adj, _layer_ws(rest, l), g32.astype(dt), saveds[l],
                    act, n_blocks, dt,
                    drop=_drop_ctx(seed_ref, l, g_ref.shape[-1]),
                )
                g32 = dx32 + g32 if residual else dx32
                wgrads_layers[l] = wgrads
        extra_wgrads = []
        if proj:
            # through x₀ = act(kbᵀ emb + bb): demb, d_kb, d_bb in-kernel
            # (fp32-compare act grads like the block walk)
            dt032 = g32 * _act_grad(act, t0).astype(jnp.float32)
            dt0c = dt032.astype(dt)
            kb_idx = 1 if vocab_sizes else 0
            extra_wgrads = [
                _dot_c11(emb, dt0c),  # d_kb (E, D) fp32, original orientation
                jnp.sum(dt032, axis=1, keepdims=True),  # d_bb (D, 1)
            ]
            if vocab_sizes:
                # demb never leaves VMEM: the table cotangent accumulates
                # here (compute-dtype round at the emb boundary, matching
                # the unfused cast vjp); codes get no cotangent, so there
                # is no dx output at all
                dembc = _dot(rest[kb_idx][...], dt0c, dt)  # (E, G·ab)
                extra_wgrads.insert(0, _dot_c11(dembc, oh))  # d_bd (E, ΣV)
            else:
                dx_ref[...] = _dot(rest[0][...], dt0c, dx_ref.dtype)
        else:
            dx_ref[...] = g32.astype(dx_ref.dtype)
        flat_wgrads = extra_wgrads + [
            wg for lws in wgrads_layers for wg in lws
        ]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        for r, wg in zip(grad_refs, flat_wgrads):
            r[...] += wg

    def _prep(ws_f32):
        # Cast master fp32 weights to the compute dtype INSIDE the op (so
        # the VJP's cotangents stay fp32 — no bf16 round-trip on dW) and
        # transform to the feature-major kernel form (see _prep_layer).
        out = []
        for l in range(n_layers):
            out.extend(_prep_layer(ws_f32[l * n_orig : (l + 1) * n_orig], dt))
        return tuple(out)

    _grad_shape = _grad_shape_of

    def _unprep_grads(ws_f32, prepped_grads):
        # Map PREPPED-order fp32 grads back to the caller's weight order.
        out = []
        for l in range(n_layers):
            out += _unprep_layer_grads(
                ws_f32[l * n_orig : (l + 1) * n_orig],
                prepped_grads[l * n_w : (l + 1) * n_w],
            )
        return out

    def _adj_spec(G, ab):
        return pl.BlockSpec(
            (G, ab, ab), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def _prep_all(ws_f32):
        if not proj:
            return _prep(ws_f32), 0, ws_f32[0].shape[1]
        pre = ()
        extra_rows = 0
        if vocab_sizes:
            bd = ws_f32[0]  # (E, ΣV) fp32 block-diag table
            pre = (bd.astype(dt),)
            extra_rows = bd.shape[0] + bd.shape[1]  # emb + onehot rows
            ws_f32 = ws_f32[1:]
        kb, bb = ws_f32[:2]
        ws = pre + (
            kb.astype(dt),
            bb.astype(dt).reshape(-1, 1),
        ) + _prep(ws_f32[2:])
        return ws, kb.shape[0] + extra_rows, kb.shape[1]

    def forward(xT, adj, seed, *ws_f32):
        d_in, A = xT.shape
        nb, ab, _ = adj.shape
        ws, e_rows, d = _prep_all(ws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group(nb, ab, d, n_layers, n_blocks, dt.itemsize, False,
                        dropout, extra_rows=e_rows, wide=wide)
        flops = 2 * nb * ab * (
            n_layers * ab * d + sum(w.size for w in ws if w.shape[1] > 1)
        )
        # vocab mode: xT holds int32 codes — the output is still the
        # compute-dtype x_other
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(d_in, G * ab),
                _adj_spec(G, ab),
                *[_const_spec(w.shape) for w in ws],
            ],
            out_specs=[_lane_spec(d, G * ab)] * (1 + n_saved),
            out_shape=[jax.ShapeDtypeStruct((d, A), dt if vocab_sizes else xT.dtype)]
            + [jax.ShapeDtypeStruct((d, A), dt)] * n_saved,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xT.size * 4,
                transcendentals=n_layers * nb * ab * d,
            ),
            interpret=interpret,
        )(*seed_vals, xT, adj, *ws)
        return outs[0], tuple(outs[1:])

    def backward_call(xT, adj, seed, ws_f32, xs, gT):
        d_in, A = xT.shape
        nb, ab, _ = adj.shape
        ws, e_rows, d = _prep_all(ws_f32)
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group(nb, ab, d, n_layers, n_blocks, dt.itemsize, True,
                        dropout, extra_rows=e_rows + (d if proj else 0),
                        save_xs=save_xs)
        # weight-grad outputs: the in-kernel projection grads (original
        # orientation already) come first, then the prepped layer grads
        wg_shapes = [
            jax.ShapeDtypeStruct(_grad_shape(w), jnp.float32)
            for w in ws[n_extra:]
        ]
        if proj:
            kb_idx = 1 if vocab_sizes else 0
            pre_shapes = [
                jax.ShapeDtypeStruct(ws[kb_idx].shape, jnp.float32),  # d_kb
                jax.ShapeDtypeStruct((d, 1), jnp.float32),  # d_bb
            ]
            if vocab_sizes:
                pre_shapes.insert(
                    0, jax.ShapeDtypeStruct(ws[0].shape, jnp.float32)  # d_bd
                )
            wg_shapes = pre_shapes + wg_shapes
        if vocab_sizes:
            # codes carry no cotangent: no dx output at all
            dx_specs, dx_shapes = [], []
        else:
            dx_specs = [_lane_spec(d_in, G * ab)]
            dx_shapes = [jax.ShapeDtypeStruct((d_in, A), xT.dtype)]
        flops = 3 * 2 * nb * ab * (
            n_layers * ab * d + sum(w.size for w in ws if w.shape[1] > 1)
        )
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(d_in, G * ab),
                _adj_spec(G, ab),
                *[_const_spec(w.shape) for w in ws],
                _lane_spec(d, G * ab),
                *[_lane_spec(d, G * ab)] * n_saved,
            ],
            out_specs=[
                *dx_specs,
                *[_const_spec(sh.shape) for sh in wg_shapes],
            ],
            out_shape=[
                *dx_shapes,
                *wg_shapes,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xT.size * 8,
                transcendentals=2 * n_layers * nb * ab * d,
            ),
            interpret=interpret,
        )(*seed_vals, xT, adj, *ws, gT, *xs)
        if vocab_sizes:
            dbd, dkb, dbb = outs[0], outs[1], outs[2]
            return None, [
                dbd, dkb, dbb.reshape(ws_f32[2].shape),
            ] + _unprep_grads(ws_f32[3:], outs[3:])
        if proj:
            dkb, dbb = outs[1], outs[2]
            return outs[0], [
                dkb, dbb.reshape(ws_f32[1].shape),
            ] + _unprep_grads(ws_f32[2:], outs[3:])
        return outs[0], _unprep_grads(ws_f32, outs[1:])

    # ``seed`` is a traced (1,) float32 holding uint32 bits (bitcast by the
    # caller): float dtype so the custom VJP can hand back a plain zero
    # cotangent (integer primals would need float0 bookkeeping).
    @jax.custom_vjp
    def op(xT, adj, seed, *ws_f32):
        return forward(xT, adj, seed, *ws_f32)[0]

    def op_fwd(xT, adj, seed, *ws_f32):
        out, xs = forward(xT, adj, seed, *ws_f32)
        return out, (xT, adj, seed, ws_f32, xs)

    def op_bwd(res, g):
        xT, adj, seed, ws_f32, xs = res
        dx, wgrads = backward_call(xT, adj, seed, ws_f32, xs, g)
        return (dx, None, jnp.zeros_like(seed), *wgrads)

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_mp_layer(
    x,
    bin_adj,
    weights,
    *,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
):
    """Fused shell-convolution layer over the binned layout.

    x: (A, D) activations (A = nb·ab); bin_adj: (nb, ab, ab) int8 edge
    multiplicities; weights: flat tuple
    ``(w_in0, w_in1, b_in, w_s0, w_s1, b_s, [w1, b1, w2, b2] × blocks)``
    in fp32 (master params — cast to the compute dtype here so the VJP
    returns fp32 weight grads).  Returns the layer output (A, D); the
    caller adds the outer residual (reference gnn.py:302-306).

    ``dropout``/``drop_seed``: in-kernel hash-RNG dropout (module
    docstring).  The kernel tags only blocks WITHIN this layer, so
    ``drop_seed`` must differ per layer and per step — flax's
    ``make_rng`` inside each layer module provides exactly that (the key
    is folded with the module path).
    """
    nb, ab, _ = bin_adj.shape
    A, D = x.shape
    assert A == nb * ab, (A, nb, ab)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_stack_op(
        act, num_mlp_layers, 1, dt.name, interpret, False, float(dropout)
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    out = op(x.astype(dt).T, bin_adj, seed, *weights)
    return out.T


def binned_mp_stack(
    x,
    bin_adj,
    weights_layers,
    *,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
):
    """Fused stack of shell-convolution layers with in-kernel residuals.

    Runs the model's whole message-passing loop (reference gnn.py:276-308,
    without the optional charge/stereo pre-steps) as ONE pallas_call:
    ``x ← layer_l(x) + x`` for every layer, all inter-layer activations
    resident in VMEM.  ``weights_layers`` is a sequence of per-layer flat
    weight tuples in the order ``binned_mp_layer`` documents.  Returns the
    final x_other (A, D) — residuals already applied.

    ``dropout`` applies the reference's in-block dropout (linear → act →
    dropout → linear) via the in-kernel hash RNG; ``drop_seed`` is a (1,)
    int32/uint32 array that must change per step (derive from the step's
    dropout PRNG key).
    """
    nb, ab, _ = bin_adj.shape
    A, D = x.shape
    assert A == nb * ab, (A, nb, ab)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_stack_op(
        act, num_mlp_layers, len(weights_layers), dt.name, interpret, True,
        float(dropout), save_xs=save_xs_enabled(),
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    flat = tuple(w for lws in weights_layers for w in lws)
    out = op(x.astype(dt).T, bin_adj, seed, *flat)
    return out.T


def binned_mp_stack_t(
    xT,
    bin_adj,
    weights_layers,
    *,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
    proj_weights=None,
    embed_spec=None,
    wide: bool = False,
):
    """Feature-major entry: xT (D, A) in, (D, A) out — NO transposes at
    the op boundary.  For callers whose whole atom datapath is
    feature-major (models/gnn.py binned fast path); semantics identical
    to :func:`binned_mp_stack`.

    With ``proj_weights=(kb (E, D), bb (D,))`` (fp32 masters), ``xT`` is
    instead the CONCAT EMBEDDING array embT (E, A) and the kernel computes
    the x_other projection x₀ = act(kbᵀ emb + bb) in VMEM — the (D, A)
    pre-MP array never exists in HBM, and the backward emits
    demb/d_kb/d_bb directly (reference projection+split:
    src/models/gnn.py:224-231).

    With additionally ``embed_spec=(codes (F, A) int32, blockdiag_t
    (E, ΣV) fp32, vocab_sizes)``, xT is ignored: the embedding one-hot
    matmul (ops/embed.py semantics) also runs in-kernel and the backward
    emits the block-diag table gradient — no (E, A) embedding array
    exists in HBM in either direction."""
    nb, ab, _ = bin_adj.shape
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    vocab = None
    if embed_spec is not None:
        assert proj_weights is not None, "embed fold requires the proj fold"
        codes, bd_t, vocab = embed_spec
        vocab = tuple(int(v) for v in vocab)
        xin = codes.astype(jnp.int32)
    else:
        xin = xT.astype(dt)
    assert xin.shape[1] == nb * ab, (xin.shape, nb, ab)
    op = _make_stack_op(
        act, num_mlp_layers, len(weights_layers), dt.name, interpret, True,
        float(dropout), proj=proj_weights is not None, vocab_sizes=vocab,
        wide=wide, save_xs=save_xs_enabled(),
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    flat = tuple(w for lws in weights_layers for w in lws)
    if embed_spec is not None:
        kb, bb = proj_weights
        return op(xin, bin_adj, seed, bd_t, kb, bb, *flat)
    if proj_weights is not None:
        kb, bb = proj_weights
        return op(xin, bin_adj, seed, kb, bb, *flat)
    return op(xin, bin_adj, seed, *flat)


# --------------------------------------------------------------------- #
# External-aggregation layer op (halo-partitioned mode, ops/halo.py)
# --------------------------------------------------------------------- #


@functools.lru_cache(maxsize=16)
def _make_ext_layer_op(act, n_blocks, dtype_name, interpret, dropout, ab):
    """Custom-VJP fused op for ONE shell-conv layer whose aggregation is
    computed OUTSIDE the kernel: ``f(xaT, seed, *ws)`` with
    xaT = [xT ‖ aggT] (2D, A) already concatenated by the caller.

    Why it exists: in halo-partitioned execution the aggregation has a
    remote component (boundary rows arriving via ``lax.all_to_all``).
    Keeping the aggregation in XLA lets the collective overlap with the
    LOCAL per-bin aggregation matmuls (both depend only on the previous
    layer's output), and this kernel then runs the projection + MLP chain
    in VMEM exactly like the single-chip megakernel.  The backward emits
    the full dxaT (2D, A) cotangent; XLA transposes the outside
    aggregation (einsum transpose + the collective's transpose, which is
    exactly the boundary scatter-add the math requires).
    """
    dt = jnp.dtype(dtype_name)
    n_w = 4 + 4 * n_blocks

    def _drop_ctx(seed_ref, lanes):
        if dropout == 0.0:
            return None
        lane_off = jnp.uint32(pl.program_id(0)) * jnp.uint32(lanes)
        return (dropout, jnp.uint32(seed_ref[0]), 0, lane_off)

    def fwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        xa_ref, *rest = refs[1 if dropout else 0 :]
        out_ref = rest[n_w]
        ws = tuple(r[...] for r in rest[:n_w])
        xa = xa_ref[...]
        out_ref[...] = _fwd_math_xa(
            xa, ws, act, n_blocks, dt, drop=_drop_ctx(seed_ref, xa.shape[-1])
        )

    def bwd_kernel(*refs):
        seed_ref = refs[0] if dropout else None
        xa_ref, *rest = refs[1 if dropout else 0 :]
        g_ref = rest[n_w]
        dxa_ref = rest[n_w + 1]
        grad_refs = rest[n_w + 2 :]
        ws = tuple(r[...] for r in rest[:n_w])
        xa = xa_ref[...]
        drop = _drop_ctx(seed_ref, xa.shape[-1])
        # recompute pass stays in VMEM (same remat rationale as the stack);
        # grad_only skips the skip-projection + final-block matmuls the
        # gradient walk never reads
        _, saved = _fwd_math_xa(
            xa, ws, act, n_blocks, dt, keep=True, drop=drop, grad_only=True
        )
        dxa32, wgrads = _bwd_xa_from_saved(
            ws, g_ref[...].astype(dt), saved, act, n_blocks, dt, drop=drop
        )
        dxa_ref[...] = dxa32.astype(dxa_ref.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        for r, wg in zip(grad_refs, wgrads):
            r[...] += wg

    def forward(xaT, seed, *ws_f32):
        d2, A = xaT.shape
        nb = A // ab
        ws = _prep_layer(ws_f32, dt)
        d = ws[0].shape[0]
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group(
            nb, ab, d, 1, n_blocks, dt.itemsize, False, dropout, extra_rows=2 * d
        )
        flops = 2 * A * sum(w.size for w in ws if w.shape[1] > 1)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(d2, G * ab),
                *[_const_spec(w.shape) for w in ws],
            ],
            out_specs=_lane_spec(d, G * ab),
            out_shape=jax.ShapeDtypeStruct((d, A), xaT.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xaT.size * xaT.dtype.itemsize * 2,
                transcendentals=A * d,
            ),
            interpret=interpret,
        )(*seed_vals, xaT, *ws)

    def backward_call(xaT, seed, ws_f32, gT):
        d2, A = xaT.shape
        nb = A // ab
        ws = _prep_layer(ws_f32, dt)
        d = ws[0].shape[0]
        seed_specs, seed_vals = _seed_args(seed, dropout)
        G = _pick_group(
            nb, ab, d, 1, n_blocks, dt.itemsize, True, dropout, extra_rows=2 * d
        )
        wg_shapes = [jax.ShapeDtypeStruct(_grad_shape_of(w), jnp.float32) for w in ws]
        flops = 3 * 2 * A * sum(w.size for w in ws if w.shape[1] > 1)
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb // G,),
            in_specs=[
                *seed_specs,
                _lane_spec(d2, G * ab),
                *[_const_spec(w.shape) for w in ws],
                _lane_spec(d, G * ab),
            ],
            out_specs=[
                _lane_spec(d2, G * ab),
                *[_const_spec(sh.shape) for sh in wg_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d2, A), xaT.dtype),
                *wg_shapes,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xaT.size * xaT.dtype.itemsize * 3,
                transcendentals=2 * A * d,
            ),
            interpret=interpret,
        )(*seed_vals, xaT, *ws, gT)
        return outs[0], _unprep_layer_grads(ws_f32, outs[1:])

    @jax.custom_vjp
    def op(xaT, seed, *ws_f32):
        return forward(xaT, seed, *ws_f32)

    def op_fwd(xaT, seed, *ws_f32):
        return forward(xaT, seed, *ws_f32), (xaT, seed, ws_f32)

    def op_bwd(res, g):
        xaT, seed, ws_f32 = res
        dxa, wgrads = backward_call(xaT, seed, ws_f32, g)
        return (dxa, jnp.zeros_like(seed), *wgrads)

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_mp_layer_ext_t(
    xaT,
    weights,
    *,
    ab: int,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
):
    """One fused shell-conv layer on a PRE-AGGREGATED feature-major input.

    xaT: (2D, A) = [xT ‖ aggT] with A = nb·ab — the caller computed the
    neighborhood aggregation (local per-bin matmuls + halo contributions;
    ops/halo.py) so the collective can overlap with the local matmuls.
    ``weights`` is one layer's flat fp32 tuple in ``binned_mp_layer``
    order.  Returns the layer output (D, A); the caller adds the residual
    (reference gnn.py:302-306).

    ``drop_seed`` must differ per layer AND per step (the in-kernel hash
    RNG tags only blocks within this one layer).
    """
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_ext_layer_op(
        act, num_mlp_layers, dt.name, interpret, float(dropout), int(ab)
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    return op(xaT.astype(dt), seed, *weights)


def binned_mp_layer_t(
    x_otherT,
    bin_adj,
    weights,
    *,
    act: str = "silu",
    num_mlp_layers: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    dropout: float = 0.0,
    drop_seed=None,
):
    """ONE fused shell-conv layer, feature-major, aggregation in-kernel:
    xT (D, A) in, (D, A) out, caller adds the residual.  For per-layer
    callers on a single chip (config-3 inject path) where no collective
    needs to overlap the aggregation — the per-bin agg matmuls stay in
    VMEM instead of costing an XLA einsum + (2D, A) concat per layer
    (measured ~4 ms/layer at the 32k flagship batch, round 3)."""
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_stack_op(
        act, num_mlp_layers, 1, dt.name, interpret, False, float(dropout)
    )
    if dropout > 0.0:
        assert drop_seed is not None, "dropout requires a per-step seed"
        seed = jax.lax.bitcast_convert_type(
            drop_seed.reshape(1).astype(jnp.int32), jnp.float32
        )
    else:
        seed = jnp.zeros((1,), jnp.float32)
    return op(x_otherT.astype(dt), bin_adj, seed, *weights)
