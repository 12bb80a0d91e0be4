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

The backward pass is a custom VJP whose kernel RECOMPUTES the forward
per-bin (rematerialization is free here: the recompute stays in VMEM) and
accumulates weight gradients across the sequential TPU grid into
constant-index output blocks (fp32).  Gradients match XLA autodiff of the
unfused path to bf16 tolerance (same bf16 rounding points, fp32 matmul
accumulation everywhere).

Numerics notes
- bf16 mode reproduces the unfused path's cast points exactly: fp32 MXU
  accumulation → bf16 cast → bf16 bias add (models/layers.py ``Linear`` /
  ``_proj``).
- Dropout is NOT supported in-kernel; callers fall back to the unfused
  binned path when ``dropout > 0`` and not deterministic.
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


def _act_grad(name, u):
    one = jnp.asarray(1, u.dtype)
    if name == "silu":
        s = _sigmoid(u)
        return s * (one + u * (one - s))
    if name == "relu":
        return (u > 0).astype(u.dtype)
    if name == "leakyrelu":
        return jnp.where(u >= 0, one, jnp.asarray(0.01, u.dtype))
    if name == "elu":
        return jnp.where(u > 0, one, jnp.exp(u))
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


def _dot_t1(a, b):
    """aᵀ @ b contracting dim 0 of both — fp32 out (weight gradients)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t2(a, w):
    """a @ wᵀ contracting dim 1 of both (input gradients)."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------- #
# Shared per-bin math (pure jnp on (ab, ·) arrays): the fwd/bwd kernel
# bodies call these, and tests can call them directly.
# --------------------------------------------------------------------- #


def _fwd_math(x, adj, ws, act, n_blocks, dt, keep=False):
    """One shell-conv layer for one bin.  ``ws`` is the flat weight tuple
    (already cast to the compute dtype); returns out (+ intermediates when
    ``keep`` for the backward recompute)."""
    w_in0, w_in1, b_in, w_s0, w_s1, b_s = ws[:6]
    agg32 = jnp.dot(
        adj.astype(dt), x.astype(dt), preferred_element_type=jnp.float32
    )
    a = agg32.astype(dt)
    t = (
        jnp.dot(x, w_in0, preferred_element_type=jnp.float32)
        + jnp.dot(a, w_in1, preferred_element_type=jnp.float32)
    ).astype(dt) + b_in
    h = _act_value(act, t)
    s = (
        jnp.dot(x, w_s0, preferred_element_type=jnp.float32)
        + jnp.dot(a, w_s1, preferred_element_type=jnp.float32)
    ).astype(dt) + b_s
    hs, us, vs = [], [], []
    for i in range(n_blocks):
        w1, b1, w2, b2 = ws[6 + 4 * i : 10 + 4 * i]
        u = _dot(h, w1, dt) + b1
        v = _act_value(act, u)
        if keep:
            hs.append(h)
            us.append(u)
            vs.append(v)
        h = _dot(v, w2, dt) + b2 + h
    out = h + s
    if keep:
        return out, (a, t, hs, us, vs)
    return out


def _bwd_math(x, adj, ws, g, act, n_blocks, dt):
    """Recompute the forward, then walk the chain backward.  Returns
    (dx, per-weight fp32 grads in the same order as ``ws``)."""
    _, (a, t, hs, us, vs) = _fwd_math(x, adj, ws, act, n_blocks, dt, keep=True)
    w_in0, w_in1, _, w_s0, w_s1, _ = ws[:6]

    g = g.astype(dt)
    # out = h_L + s  ⇒ both branches see g
    d_ws0 = _dot_t1(x, g)
    d_ws1 = _dot_t1(a, g)
    d_bs = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dx32 = _dot_t2(g, w_s0)
    da32 = _dot_t2(g, w_s1)

    dh = g
    grads_blocks = []
    for i in range(n_blocks - 1, -1, -1):
        w1, _, w2, _ = ws[6 + 4 * i : 10 + 4 * i]
        # h_{i+1} = (act(h_i w1 + b1) w2 + b2) + h_i
        dw_out = dh  # grad at the w2-matmul output
        d_w2 = _dot_t1(vs[i], dw_out)
        d_b2 = jnp.sum(dw_out.astype(jnp.float32), axis=0, keepdims=True)
        dv = _dot_t2(dw_out, w2).astype(dt)
        du = dv * _act_grad(act, us[i])
        d_w1 = _dot_t1(hs[i], du)
        d_b1 = jnp.sum(du.astype(jnp.float32), axis=0, keepdims=True)
        dh = (dh.astype(jnp.float32) + _dot_t2(du, w1)).astype(dt)
        grads_blocks.append((d_w1, d_b1, d_w2, d_b2))
    grads_blocks.reverse()

    dt_in = dh * _act_grad(act, t)
    d_win0 = _dot_t1(x, dt_in)
    d_win1 = _dot_t1(a, dt_in)
    d_bin = jnp.sum(dt_in.astype(jnp.float32), axis=0, keepdims=True)
    dx32 = dx32 + _dot_t2(dt_in, w_in0)
    da32 = da32 + _dot_t2(dt_in, w_in1)

    # agg = adj @ x  ⇒ dx += adjᵀ @ da
    dx32 = dx32 + _dot_t1(adj.astype(dt), da32.astype(dt))

    wgrads = [d_win0, d_win1, d_bin, d_ws0, d_ws1, d_bs]
    for gb in grads_blocks:
        wgrads.extend(gb)
    return dx32.astype(x.dtype), wgrads


# --------------------------------------------------------------------- #
# pallas_call wrappers
# --------------------------------------------------------------------- #


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM
    )


def _bin_spec(ab, d2):
    return pl.BlockSpec(
        (1, ab, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )


@functools.lru_cache(maxsize=32)
def _make_layer_op(act, n_blocks, dtype_name, interpret):
    """Build the custom-VJP fused layer op for a static configuration.

    Signature of the returned fn: ``f(x3, adj, *ws)`` with
    x3 (nb, ab, D), adj (nb, ab, ab) int8, and ws the flat weight tuple in
    compute dtype (fp32 master weights cast by the caller) — returns the
    layer output (nb, ab, D) (NO input residual; the model adds it).
    """
    dt = jnp.dtype(dtype_name)
    n_w = 6 + 4 * n_blocks

    def fwd_kernel(x_ref, adj_ref, *rest):
        ws = tuple(r[...] for r in rest[:n_w])
        out_ref = rest[n_w]
        out_ref[0] = _fwd_math(x_ref[0], adj_ref[0], ws, act, n_blocks, dt)

    def bwd_kernel(x_ref, adj_ref, *rest):
        ws = tuple(r[...] for r in rest[:n_w])
        g_ref = rest[n_w]
        dx_ref = rest[n_w + 1]
        grad_refs = rest[n_w + 2 :]
        dx, wgrads = _bwd_math(
            x_ref[0], adj_ref[0], ws, g_ref[0], act, n_blocks, dt
        )
        dx_ref[0] = dx

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        for r, wg in zip(grad_refs, wgrads):
            r[...] += wg

    def _prep(ws_f32):
        # cast master fp32 weights to the compute dtype INSIDE the op so
        # the VJP's cotangents stay fp32 (no bf16 round-trip on dW)
        return tuple(
            w.astype(dt) if w.ndim == 2 else w.astype(dt).reshape(1, -1)
            for w in ws_f32
        )

    def forward(x3, adj, *ws_f32):
        nb, ab, d = x3.shape
        ws = _prep(ws_f32)
        flops = 2 * nb * ab * (ab * d + sum(w.size for w in ws if w.ndim == 2))
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=[
                _bin_spec(ab, d),
                _bin_spec(ab, ab),
                *[_const_spec(w.shape) for w in ws],
            ],
            out_specs=_bin_spec(ab, d),
            out_shape=jax.ShapeDtypeStruct((nb, ab, d), x3.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=x3.size * 4, transcendentals=nb * ab * d
            ),
            interpret=interpret,
        )(x3, adj, *ws)

    def backward_call(x3, adj, ws_f32, g):
        nb, ab, d = x3.shape
        ws = _prep(ws_f32)
        wg_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        flops = 3 * 2 * nb * ab * (ab * d + sum(w.size for w in ws if w.ndim == 2))
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb,),
            in_specs=[
                _bin_spec(ab, d),
                _bin_spec(ab, ab),
                *[_const_spec(w.shape) for w in ws],
                _bin_spec(ab, d),
            ],
            out_specs=[
                _bin_spec(ab, d),
                *[_const_spec(s.shape) for s in wg_shapes],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, ab, d), x3.dtype),
                *wg_shapes,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=x3.size * 8, transcendentals=nb * ab * d
            ),
            interpret=interpret,
        )(x3, adj, *ws, g)
        dx = outs[0]
        wgrads = [
            wg.reshape(orig.shape)
            for orig, wg in zip(ws_f32, outs[1:])
        ]
        return dx, wgrads

    @jax.custom_vjp
    def op(x3, adj, *ws_f32):
        return forward(x3, adj, *ws_f32)

    def op_fwd(x3, adj, *ws_f32):
        return forward(x3, adj, *ws_f32), (x3, adj, ws_f32)

    def op_bwd(res, g):
        x3, adj, ws_f32 = res
        dx, wgrads = backward_call(x3, adj, ws_f32, g)
        return (dx, None, *wgrads)

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
):
    """Fused shell-convolution layer over the binned layout.

    x: (A, D) activations (A = nb·ab); bin_adj: (nb, ab, ab) int8 edge
    multiplicities; weights: flat tuple
    ``(w_in0, w_in1, b_in, w_s0, w_s1, b_s, [w1, b1, w2, b2] × blocks)``
    in fp32 (master params — cast to the compute dtype here so the VJP
    returns fp32 weight grads).  Returns the layer output (A, D); the
    caller adds the outer residual (reference gnn.py:302-306).
    """
    nb, ab, _ = bin_adj.shape
    A, D = x.shape
    assert A == nb * ab, (A, nb, ab)
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(
        jnp.float32
    )
    op = _make_layer_op(act, num_mlp_layers, dt.name, interpret)
    x3 = x.astype(dt).reshape(nb, ab, D)
    out = op(x3, bin_adj, *weights)
    return out.reshape(A, D)
