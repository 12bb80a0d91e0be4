"""Weighted per-molecule pooling over the flat feature-major layout.

``pooled[d, b·mb+m] = Σ_a x[d, b·ab+a] · w[0, b·ab+a] · pm[b, m, a]`` — the
attention-weighted (or plain, w≡1) molecule pool of a feature-major atom
array.  The XLA einsum formulation (``dba,bma->dbm`` on a (D, nb, ab)
reshape) makes layout assignment materialize ~7 ms/step of relayout copies
around the batched dot at the flagship shape (round-2 profile); this
kernel reads the flat (D, A) array in lane windows and runs the per-bin
(D, ab) @ (ab, mb) contractions in VMEM — no 3-d intermediates exist.

Custom VJP: dx = (g @ pm) · w (cast to x's dtype), dw = Σ_d (g @ pm) · x.
Numerics match the einsum path: inputs multiply in the compute dtype,
matmuls accumulate fp32, pooled output is fp32.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def wpool_kernel_enabled() -> str | None:
    """Default ON for the TPU backend; ``AIMNET_WPOOL_KERNEL=0`` disables,
    ``=interpret`` forces the interpreter path off-TPU (tests)."""
    env = os.environ.get("AIMNET_WPOOL_KERNEL", "").lower()
    if env in ("0", "off", "false"):
        return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu":
        return "tpu"
    if env in ("1", "on", "true"):
        return "interpret"
    return None


def _dot_c11(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


DT = 128  # feature-row tile: the grid also walks d in 128-row blocks


def _pick_group(nb, d, ab, mb, itemsize, bwd, interpret=False):
    """Largest VMEM-fitting G with 128-divisible lane windows on BOTH the
    atom side (G·ab) and the molecule side (G·mb) — Mosaic requires block
    lane dims divisible by 128 (or full-array).  Blocks span at most DT
    feature rows, so the kernel's scoped-vmem footprint stays small
    enough to coexist with the MP megakernel's backward (shared scoped
    budget).  None ⇒ no legal grouping; the caller falls back to the
    einsum path."""
    env = os.environ.get("AIMNET_WPOOL_GROUP")
    if env:
        cap = max(1, int(env))
    else:
        rows = min(d, DT)
        # live buffers: x + xw (+ gatom f32 + dx in bwd)
        per_lane = (2 * rows * itemsize + (4 + itemsize) * rows) if bwd             else (2 * rows * itemsize)
        per_lane += ab + 8
        budget = 7 * 2**20
        cap = max(1, int(budget // (per_lane * ab)))
    cap = min(cap, nb, 32)
    for G in range(cap, 0, -1):
        if nb % G and not interpret:
            continue
        if interpret or ((G * ab) % 128 == 0 and (G * mb) % 128 == 0):
            if nb % G == 0:
                return G
    return None


@functools.lru_cache(maxsize=16)
def _make_wpool_op(dtype_name, interpret):
    dt = jnp.dtype(dtype_name)

    def fwd_kernel(x_ref, w_ref, pm_ref, out_ref):
        x = x_ref[...]  # (D, G*ab)
        w = w_ref[...].astype(dt)  # (1, G*ab)
        pm = pm_ref[...]  # (G, mb, ab) int8
        G, mb, ab = pm.shape
        xw = x * w  # compute-dtype product, like the einsum path
        parts = [
            _dot_c11(
                jax.lax.slice_in_dim(xw, g * ab, (g + 1) * ab, axis=1),
                pm[g].astype(dt),
            )
            for g in range(G)
        ]
        out_ref[...] = parts[0] if G == 1 else jnp.concatenate(parts, axis=1)

    def make_bwd_kernel(d, r):
        def bwd_kernel(x_ref, w_ref, pm_ref, g_ref, dx_ref, dw_ref):
            x = x_ref[...]
            w32 = w_ref[...].astype(jnp.float32)
            pm = pm_ref[...]
            G, mb, ab = pm.shape
            gout = g_ref[...]  # (r, G*mb) fp32
            gat = []
            for g in range(G):
                gg = jax.lax.slice_in_dim(gout, g * mb, (g + 1) * mb, axis=1)
                gat.append(
                    jnp.dot(
                        gg.astype(dt), pm[g].astype(dt),
                        preferred_element_type=jnp.float32,
                    )
                )
            gatom = gat[0] if G == 1 else jnp.concatenate(gat, axis=1)
            dx_ref[...] = (gatom * w32).astype(dx_ref.dtype)
            # dw accumulates over the feature-tile grid axis (same lane
            # window revisited for every j; grid iterates j minor-most)
            prod = gatom * x.astype(jnp.float32)
            if d % r:
                # the last row tile reads past the array: those padded
                # rows carry garbage — zero them before the row-reduction
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, prod.shape, 0)
                    + pl.program_id(1) * r
                )
                prod = jnp.where(row < d, prod, 0.0)
            part = jnp.sum(prod, axis=0, keepdims=True)

            @pl.when(pl.program_id(1) == 0)
            def _():
                dw_ref[...] = jnp.zeros_like(dw_ref)

            dw_ref[...] += part

        return bwd_kernel

    def _tile(r, lanes):
        # 2-d grid (lane window i, feature tile j)
        return pl.BlockSpec(
            (r, lanes), lambda i, j: (j, i), memory_space=pltpu.VMEM
        )

    def _row0(lanes):
        return pl.BlockSpec(
            (1, lanes), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )

    def _pm_spec(G, mb, ab):
        return pl.BlockSpec(
            (G, mb, ab), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def forward(xT, w, pm):
        d, A = xT.shape
        nb, mb, ab = pm.shape
        G = _pick_group(nb, d, ab, mb, dt.itemsize, False, interpret)
        r = min(d, DT)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb // G, -(-d // r)),
            in_specs=[_tile(r, G * ab), _row0(G * ab), _pm_spec(G, mb, ab)],
            out_specs=_tile(r, G * mb),
            out_shape=jax.ShapeDtypeStruct((d, nb * mb), jnp.float32),
            interpret=interpret,
        )(xT, w, pm)

    def backward_call(xT, w, pm, g):
        d, A = xT.shape
        nb, mb, ab = pm.shape
        G = _pick_group(nb, d, ab, mb, dt.itemsize, True, interpret)
        r = min(d, DT)
        return pl.pallas_call(
            make_bwd_kernel(d, r),
            grid=(nb // G, -(-d // r)),
            in_specs=[
                _tile(r, G * ab), _row0(G * ab), _pm_spec(G, mb, ab),
                _tile(r, G * mb),
            ],
            out_specs=[_tile(r, G * ab), _row0(G * ab)],
            out_shape=[
                jax.ShapeDtypeStruct((d, A), xT.dtype),
                jax.ShapeDtypeStruct((1, A), jnp.float32),
            ],
            interpret=interpret,
        )(xT, w, pm, g)

    @jax.custom_vjp
    def op(xT, w, pm):
        return forward(xT, w, pm)

    def op_fwd(xT, w, pm):
        return forward(xT, w, pm), (xT, w, pm)

    def op_bwd(res, g):
        xT, w, pm = res
        dx, dw = backward_call(xT, w, pm, g)
        return (dx, dw.astype(res[1].dtype), None)

    op.defvjp(op_fwd, op_bwd)
    return op


def binned_wpool_t(xT, wbar, pool_mat, *, interpret: bool = False):
    """Weighted pool: xT (D, A), wbar (A,) or (1, A) fp32, pool_mat
    (nb, mb, ab) int8 → pooled (D, nb·mb) fp32, or ``None`` when no legal
    lane-window grouping exists for these shapes (caller falls back to
    the einsum formulation)."""
    nb, mb, ab = pool_mat.shape
    d = xT.shape[0]
    it = jnp.dtype(xT.dtype).itemsize
    if (_pick_group(nb, d, ab, mb, it, False, interpret) is None
            or _pick_group(nb, d, ab, mb, it, True, interpret) is None):
        return None
    op = _make_wpool_op(jnp.dtype(xT.dtype).name, interpret)
    w = wbar.reshape(1, -1).astype(jnp.float32)
    return op(xT, w, pool_mat)
