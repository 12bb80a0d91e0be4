"""Fused multi-head attention pooling over the bin-packed layout.

One Pallas kernel per direction runs, for each 256-atom bin, the whole
chain scores → per-molecule masked softmax → head-averaged weighted pool
(reference: src/models/pooling.py:83-172 with the head-average-first
algebra of models/pooling.py) entirely in VMEM.  The (A, ·) atom arrays
are read exactly ONCE per direction; every intermediate the unfused XLA
formulation materializes — scores, exp, denominators, the weighted
(A, hidden) product, and the layout-transposed copies XLA inserts around
the ragged-width pooling einsums (~3.5 ms/step at 8192 molecules,
round-2 profile) — lives and dies in VMEM.

The op takes the PRE-projection atom parts [x_self, x_other] and the
score kernels already folded through concat_self_other and the learned
temperature (both folds are plain differentiable jnp done by the caller,
so their gradients — including d/dT — come from XLA autodiff).  Outputs
(pooled_self (B, Ds), pooled_other (B, Do), coverage (B,), attn (H, A)),
all fp32.  The caller projects: mol = pooled·K + b·coverage.

Gradient contract: the custom VJP backpropagates through pooled/coverage
(recompute-in-VMEM, same softmax-backward math XLA would emit); the attn
output is informational and emitted behind stop_gradient (no reference
code path differentiates the returned attention weights).

Numerics match models/pooling.py::binned_attention_softmax exactly: same
-1e30 mask value, same stop-gradient max-shift, same 1e-16 denominator
floor, fp32 softmax statistics, fp32 MXU accumulation for every matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pool_kernel_enabled() -> str | None:
    """Policy switch: OFF by default (``AIMNET_POOL_KERNEL=1`` enables on
    TPU, ``=interpret`` forces the interpreter path off-TPU for tests).

    Measured on v5e at 8192 molecules (round 2): the fused kernel runs
    2.1 ms fwd + 2.8 ms bwd — SLOWER than the 3.5 ms unfused XLA chain it
    replaces, because the per-bin grid (640 steps × ~16 small ops, most
    with 4-lane outputs) is dominated by Mosaic per-op overhead rather
    than the HBM traffic it saves (floor ~0.6 ms).  Kept validated (grads
    equal to the unfused path, tests/test_bin_pool.py) as the substrate
    for a multi-bin-per-step variant; the production path is the unfused
    pool-first formulation in models/pooling.py."""
    import os

    env = os.environ.get("AIMNET_POOL_KERNEL", "").lower()
    if env in ("0", "off", "false", ""):
        return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu":
        return "tpu"
    return "interpret"


def _f32dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _softmax_fwd(xs, xo, pm, ks, ko, b):
    """Per-bin scores + masked per-molecule softmax (fp32 statistics).

    xs (ab, Ds), xo (ab, Do), pm (mb, ab) int8, ks/ko folded score
    kernels in the compute dtype, b (1, H) fp32.  Returns (attn (ab, H),
    wbar (ab,), pmf (mb, ab) f32, cover (ab,) bool).
    """
    s = _f32dot(xs, ks) + _f32dot(xo, ko) + b  # (ab, H) fp32
    pmf = pm.astype(jnp.float32)  # (mb, ab)
    # All (ab, 1)-shaped quantities are built via keepdims reductions or
    # tiny MXU matmuls — Mosaic only supports minor-dim INSERTION on
    # 32-bit arrays, and bool/1-D [:, None] patterns hit that wall.
    cover = _f32dot(pmf.T, jnp.ones((pmf.shape[0], 1), jnp.float32))  # (ab, 1)
    neg = jnp.float32(-1e30)
    # per-molecule max over member atoms (mb, ab, H fits VMEM easily)
    masked = jnp.where(pmf[:, :, None] > 0, s[None, :, :], neg)
    smax = jnp.max(masked, axis=1)  # (mb, H)
    satom = _f32dot(pmf.T, smax)  # broadcast back to atoms (ab, H)
    e = jnp.where(cover > 0, jnp.exp(s - satom), 0.0)
    denom = _f32dot(pmf, e)  # (mb, H)
    denom_atom = _f32dot(pmf.T, denom)
    attn = e / jnp.maximum(denom_atom, 1e-16)  # (ab, H)
    wbar = jnp.mean(attn, axis=1, keepdims=True)  # (ab, 1)
    return attn, wbar, pmf, cover


@functools.lru_cache(maxsize=16)
def _make_pool_op(num_heads, dtype_name, interpret):
    dt = jnp.dtype(dtype_name)

    def fwd_kernel(xs_ref, xo_ref, pm_ref, ks_ref, ko_ref, b_ref,
                   ps_ref, po_ref, cov_ref, attn_ref):
        xs = xs_ref[0]
        xo = xo_ref[0]
        attn, wbar, pmf, _ = _softmax_fwd(
            xs, xo, pm_ref[0], ks_ref[...], ko_ref[...], b_ref[...]
        )
        wdt = wbar.astype(dt)  # (ab, 1)
        ps_ref[0] = _f32dot(pmf, (xs * wdt).astype(dt))
        po_ref[0] = _f32dot(pmf, (xo * wdt).astype(dt))
        cov_ref[0] = _f32dot(pmf, wbar)
        attn_ref[0] = attn

    def bwd_kernel(xs_ref, xo_ref, pm_ref, ks_ref, ko_ref, b_ref,
                   gps_ref, gpo_ref, gcov_ref,
                   dxs_ref, dxo_ref, dks_ref, dko_ref, db_ref):
        xs = xs_ref[0]
        xo = xo_ref[0]
        ks = ks_ref[...]
        ko = ko_ref[...]
        attn, wbar, pmf, _ = _softmax_fwd(xs, xo, pm_ref[0], ks, ko, b_ref[...])
        H = attn.shape[1]

        # pooled_p = pmfᵀ-weighted sums of x·w̄  ⇒ two terms: direct dx and dw̄
        gs_atom = _f32dot(pmf.T, gps_ref[0])  # (ab, Ds)
        go_atom = _f32dot(pmf.T, gpo_ref[0])  # (ab, Do)
        dxs32 = gs_atom * wbar  # wbar is (ab, 1)
        dxo32 = go_atom * wbar
        dwbar = (
            jnp.sum(gs_atom * xs.astype(jnp.float32), axis=1, keepdims=True)
            + jnp.sum(go_atom * xo.astype(jnp.float32), axis=1, keepdims=True)
            + _f32dot(pmf.T, gcov_ref[0])
        )  # (ab, 1)

        # w̄ = mean_h attn  →  d_attn = dw̄ / H ; softmax backward per mol:
        # ds = attn·(d_attn − Σ_mol attn·d_attn)
        dattn = dwbar / jnp.float32(H)  # (ab, 1) broadcasts over heads
        t_mol = _f32dot(pmf, attn * dattn)  # (mb, H)
        t_atom = _f32dot(pmf.T, t_mol)
        ds = (attn * dattn - attn * t_atom).astype(dt)  # (ab, H)

        # scores = xs·ks + xo·ko + b
        dxs32 = dxs32 + jax.lax.dot_general(
            ds, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dxo32 = dxo32 + jax.lax.dot_general(
            ds, ko, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dxs_ref[0] = dxs32.astype(dxs_ref.dtype)
        dxo_ref[0] = dxo32.astype(dxo_ref.dtype)

        d_ks = jax.lax.dot_general(
            xs.astype(dt), ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_ko = jax.lax.dot_general(
            xo.astype(dt), ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_b = jnp.sum(ds.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dks_ref[...] = jnp.zeros_like(dks_ref)
            dko_ref[...] = jnp.zeros_like(dko_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        dks_ref[...] += d_ks
        dko_ref[...] += d_ko
        db_ref[...] += d_b

    def _bin3(ab, d):
        return pl.BlockSpec((1, ab, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def _const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    def forward(xs3, xo3, pm, ks, ko, b):
        nb, ab, ds_ = xs3.shape
        do = xo3.shape[2]
        mb = pm.shape[1]
        h = ks.shape[1]
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=[
                _bin3(ab, ds_), _bin3(ab, do), _bin3(mb, ab),
                _const(ks.shape), _const(ko.shape), _const(b.shape),
            ],
            out_specs=[
                _bin3(mb, ds_), _bin3(mb, do), _bin3(mb, 1), _bin3(ab, h),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, mb, ds_), jnp.float32),
                jax.ShapeDtypeStruct((nb, mb, do), jnp.float32),
                jax.ShapeDtypeStruct((nb, mb, 1), jnp.float32),
                jax.ShapeDtypeStruct((nb, ab, h), jnp.float32),
            ],
            interpret=interpret,
        )(xs3, xo3, pm, ks, ko, b)
        return outs

    def backward_call(xs3, xo3, pm, ks, ko, b, gps, gpo, gcov):
        nb, ab, ds_ = xs3.shape
        do = xo3.shape[2]
        mb = pm.shape[1]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nb,),
            in_specs=[
                _bin3(ab, ds_), _bin3(ab, do), _bin3(mb, ab),
                _const(ks.shape), _const(ko.shape), _const(b.shape),
                _bin3(mb, ds_), _bin3(mb, do), _bin3(mb, 1),
            ],
            out_specs=[
                _bin3(ab, ds_), _bin3(ab, do),
                _const(ks.shape), _const(ko.shape), _const(b.shape),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, ab, ds_), xs3.dtype),
                jax.ShapeDtypeStruct((nb, ab, do), xo3.dtype),
                jax.ShapeDtypeStruct(ks.shape, jnp.float32),
                jax.ShapeDtypeStruct(ko.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.shape, jnp.float32),
            ],
            interpret=interpret,
        )(xs3, xo3, pm, ks, ko, b, gps, gpo, gcov)
        return outs

    @jax.custom_vjp
    def op(xs3, xo3, pm, ks, ko, b):
        return forward(xs3, xo3, pm, ks, ko, b)

    def op_fwd(xs3, xo3, pm, ks, ko, b):
        return forward(xs3, xo3, pm, ks, ko, b), (xs3, xo3, pm, ks, ko, b)

    def op_bwd(res, g):
        xs3, xo3, pm, ks, ko, b = res
        gps, gpo, gcov, _gattn = g  # attn is stop-gradient'd by the wrapper
        dxs, dxo, dks, dko, db = backward_call(
            xs3, xo3, pm, ks, ko, b, gps, gpo, gcov
        )
        return (dxs, dxo, None, dks, dko, db)

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_attention_pool_fused(
    x_self, x_other, pool_mat, score_k, score_b, *, interpret: bool = False
):
    """Fused scores→softmax→pool over the binned layout.

    x_self (A, Ds) / x_other (A, Do) in the compute dtype; pool_mat
    (nb, mb, ab) int8; score_k (Ds+Do, H) fp32 — the concat_self_other /
    temperature folds already applied (differentiable, done by the
    caller); score_b (H,) fp32.  Returns (pooled_self (B, Ds),
    pooled_other (B, Do), coverage (B,), attn (H, A)) with
    B = nb·mb — all fp32, attn behind stop_gradient.
    """
    nb, mb, ab = pool_mat.shape
    A, ds_ = x_self.shape
    do = x_other.shape[1]
    assert A == nb * ab, (A, nb, ab)
    dt = x_self.dtype
    op = _make_pool_op(int(score_k.shape[1]), jnp.dtype(dt).name, interpret)
    ks = score_k[:ds_].astype(dt)
    ko = score_k[ds_:].astype(dt)
    b = score_b.reshape(1, -1).astype(jnp.float32)
    ps, po, cov, attn = op(
        x_self.reshape(nb, ab, ds_),
        x_other.astype(dt).reshape(nb, ab, do),
        pool_mat,
        ks, ko, b,
    )
    return (
        ps.reshape(nb * mb, ds_),
        po.reshape(nb * mb, do),
        cov.reshape(nb * mb),
        jax.lax.stop_gradient(attn.reshape(A, -1).T),
    )
