"""Fused gather+segment-sum Pallas kernel — the hot op, done the MXU way.

The model's edge aggregation is ``out[dst] += x[src]`` over ~1M edges
(reference hot kernel: torch_scatter scatter_add, src/models/layers.py:
158-163).  Honest TPU measurement (BASELINE.md round 2) shows XLA's row
gather runs at ~3% of HBM bandwidth (row-at-a-time DMA for D=153 rows)
and dominates the whole train step.  This kernel removes the row gather
entirely by exploiting a structural fact of molecular batches: collate
packs molecules contiguously, and edges never cross molecules, so **the
sources of all edges landing in a 256-atom destination window lie in a
small contiguous source block** (window ± the largest molecule).

Per (window, chunk) grid step, everything is dense MXU work:

    x_block   = DMA  x[base_w : base_w + SB]          (scalar-prefetch base)
    gathered  = onehot(src_local) @ x_block           (EB × SB) @ (SB × D)
    out_w    += onehot(dst_local) @ gathered          (AW × EB) @ (EB × D)

One-hot operands are exact in bf16, accumulation is fp32
(preferred_element_type), so ``exact=True`` differs from the XLA segment
sum only by fp32-vs-MXU-pass rounding of x itself.

The backward pass ``dx[src] += g[dst]`` has the same structure with the
roles of src/dst swapped, so `fused_edge_aggregate` is a custom_vjp whose
bwd runs the SAME kernel on a source-keyed layout (built by the same host
function with arguments swapped).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class FusedEdgeLayout(struct.PyTreeNode):
    """Host-built static layout for one aggregation direction.

    Arrays (pytree leaves):
      base:      (W,) int32 — first source row DMA'd for each window
                 (8-aligned, clamped to [0, A−SB])
      src_local: (W·C, 1, chunk) int32 — src − base[w]; padding → SB
      seg_local: (W·C, 1, chunk) int32 — dst − w·window; padding → window

    Static metadata: window / chunk / source block SB / dst slot count.
    """

    base: jax.Array
    src_local: jax.Array
    seg_local: jax.Array
    window: int = struct.field(pytree_node=False, default=256)
    chunk: int = struct.field(pytree_node=False, default=256)
    sb: int = struct.field(pytree_node=False, default=512)
    num_slots: int = struct.field(pytree_node=False, default=0)  # W*window

    @property
    def num_windows(self) -> int:
        return self.base.shape[0]


def build_layout(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_mask: np.ndarray,
    num_atoms: int,
    *,
    window: int = 256,
    chunk: int = 256,
    cap: Optional[int] = None,
    sb: Optional[int] = None,
) -> FusedEdgeLayout:
    """Group real edges by destination window and localize their sources.

    ``cap``/``sb`` are minimums so loaders can pin static shapes across
    batches.  Requires num_atoms ≥ SB (callers fall back to the XLA path
    for tiny batches).
    """
    m = np.asarray(edge_mask)
    src = np.asarray(edge_src)[m].astype(np.int64)
    dst = np.asarray(edge_dst)[m].astype(np.int64)
    W = -(-num_atoms // window)

    win_of = dst // window
    order = np.argsort(win_of, kind="stable")
    src, dst, win_of = src[order], dst[order], win_of[order]
    counts = np.bincount(win_of, minlength=W)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    need_cap = int(max(counts.max() if counts.size else 1, 1))
    need_cap = -(-need_cap // chunk) * chunk
    cap = max(cap or 0, need_cap)

    # Base offsets must be DMA-tile aligned (Mosaic (8,128) fp32 / (16,128)
    # bf16 tiling: the dynamic slice start needs provable 16-divisibility,
    # asserted in-kernel via pl.multiple_of).
    ALIGN = 16
    base = np.zeros(W, np.int32)
    max_src = np.zeros(W, np.int64)
    span = 0
    for w in range(W):
        n = counts[w]
        if n:
            s = src[starts[w] : starts[w] + n]
            b = (int(s.min()) // ALIGN) * ALIGN
            span = max(span, int(s.max()) - b + 1)
            base[w] = b
            max_src[w] = int(s.max())
    need_sb = -(-max(span, 128) // 128) * 128
    SB = max(sb or 0, need_sb)
    while True:
        if SB > num_atoms:
            raise ValueError(
                f"source block {SB} exceeds atom slots {num_atoms}; use the XLA path"
            )
        lim = ((num_atoms - SB) // ALIGN) * ALIGN
        clamped = np.minimum(base, lim)
        if np.all(max_src - clamped < SB):
            base = clamped.astype(np.int32)
            break
        SB += 128  # aligned clamp pushed a window past its block; widen

    src_local = np.full((W, cap), SB, np.int32)
    seg_local = np.full((W, cap), window, np.int32)
    for w in range(W):
        n = counts[w]
        if n:
            sl = slice(starts[w], starts[w] + n)
            src_local[w, :n] = src[sl] - base[w]
            seg_local[w, :n] = dst[sl] - w * window
    C = cap // chunk
    return FusedEdgeLayout(
        base=jnp.asarray(base),
        src_local=jnp.asarray(src_local.reshape(W * C, 1, chunk)),
        seg_local=jnp.asarray(seg_local.reshape(W * C, 1, chunk)),
        window=window,
        chunk=chunk,
        sb=SB,
        num_slots=W * window,
    )


def build_layouts(
    edge_src, edge_dst, edge_mask, num_atoms, **kw
) -> Tuple[FusedEdgeLayout, FusedEdgeLayout]:
    """(forward, backward) layouts: bwd swaps src/dst (dx[src] += g[dst])."""
    fwd = build_layout(edge_src, edge_dst, edge_mask, num_atoms, **kw)
    bwd = build_layout(edge_dst, edge_src, edge_mask, num_atoms, **kw)
    return fwd, bwd


def _kernel(
    base_ref, src_ref, seg_ref, x_hbm, out_ref, xblk, sems,
    *, window: int, chunk: int, sb: int, nchunks: int, exact: bool,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = pl.program_id(0)
    W = pl.num_programs(0)
    slot = jax.lax.rem(w, 2)

    def dma_for(win, s):
        base = pl.multiple_of(base_ref[win], 16)  # host aligns; prove it
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, sb), :], xblk.at[s], sems.at[s]
        )

    if interpret:
        base = pl.multiple_of(base_ref[w], 16)
        xblk[slot] = x_hbm[pl.ds(base, sb), :]
    else:
        # double-buffered: window w's block was started at w−1; kick off
        # w+1's DMA before computing so the copy rides under the matmuls
        @pl.when(w == 0)
        def _():
            dma_for(w, slot).start()

        dma_for(w, slot).wait()

        @pl.when(w + 1 < W)
        def _():
            dma_for(w + 1, 1 - slot).start()

    dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    xb = xblk[slot].astype(dt)

    total = jnp.zeros_like(out_ref)
    for c in range(nchunks):  # static unroll: one grid step per window
        sl = src_ref[0, 0, c * chunk : (c + 1) * chunk]
        sg = seg_ref[0, 0, c * chunk : (c + 1) * chunk]
        # one-hot gather on the MXU: padding slots match no iota row → zero
        oh_src = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, sb), 1) == sl[:, None]
        ).astype(dt)
        gathered = jnp.dot(
            oh_src, xb, preferred_element_type=jnp.float32, precision=prec
        )
        oh_dst = (
            jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0) == sg[None, :]
        ).astype(dt)
        total += jnp.dot(
            oh_dst, gathered.astype(dt), preferred_element_type=jnp.float32,
            precision=prec,
        )
    out_ref[:, :] = total


def _run(x: jax.Array, layout: FusedEdgeLayout, exact: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, D = x.shape
    Dp = -(-D // 128) * 128
    if Dp != D:
        x = jnp.pad(x, ((0, 0), (0, Dp - D)))
    W = layout.num_windows
    C = layout.src_local.shape[0] // W
    window, chunk, sb = layout.window, layout.chunk, layout.sb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # base offsets land in SMEM before the body
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 1, C * chunk), lambda w, base: (w, 0, 0)),
            pl.BlockSpec((1, 1, C * chunk), lambda w, base: (w, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays off-chip; manual DMA
        ],
        out_specs=pl.BlockSpec((window, Dp), lambda w, base: (w, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, sb, Dp), x.dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, window=window, chunk=chunk, sb=sb, nchunks=C,
            exact=exact, interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W * window, Dp), jnp.float32),
        interpret=interpret,
    )(
        layout.base,
        layout.src_local.reshape(W, 1, C * chunk),
        layout.seg_local.reshape(W, 1, C * chunk),
        x,
    )
    return out[:A, :D]


# Layout arrays are batch data (tracers under jit), so they must be
# explicit custom_vjp arguments — static metadata travels via
# nondiff_argnums.  bwd returns float0 zeros for the integer inputs.
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _agg(x, fb, fs, fg, bb, bs, bg, fmeta, bmeta, exact, interpret):
    return _run(x, FusedEdgeLayout(fb, fs, fg, *fmeta), exact, interpret)


def _agg_fwd(x, fb, fs, fg, bb, bs, bg, fmeta, bmeta, exact, interpret):
    out = _run(x, FusedEdgeLayout(fb, fs, fg, *fmeta), exact, interpret)
    # zero-size dtype token: residuals must be JAX types, and the cotangent
    # must come back in the primal's dtype
    tok = jnp.zeros((0,), x.dtype)
    return out, (bb, bs, bg, fb.shape, fs.shape, fg.shape, tok)


def _agg_bwd(fmeta, bmeta, exact, interpret, res, g):
    bb, bs, bg, fb_shape, fs_shape, fg_shape, tok = res
    dx = _run(g, FusedEdgeLayout(bb, bs, bg, *bmeta), exact, interpret).astype(tok.dtype)
    f0 = jax.dtypes.float0

    def z(shape):
        return np.zeros(shape, f0)

    return (
        dx,
        z(fb_shape), z(fs_shape), z(fg_shape),
        z(bb.shape), z(bs.shape), z(bg.shape),
    )


_agg.defvjp(_agg_fwd, _agg_bwd)


def fused_edge_aggregate(
    x: jax.Array,
    fwd_layout: FusedEdgeLayout,
    bwd_layout: FusedEdgeLayout,
    *,
    exact: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable ``out[a] = Σ_{dst(e)=a} x[src(e)]`` (shape of x in,
    shape of x out) via the fused kernel; backward runs the same kernel on
    the source-keyed layout."""
    fmeta = (fwd_layout.window, fwd_layout.chunk, fwd_layout.sb, fwd_layout.num_slots)
    bmeta = (bwd_layout.window, bwd_layout.chunk, bwd_layout.sb, bwd_layout.num_slots)
    return _agg(
        x,
        fwd_layout.base, fwd_layout.src_local, fwd_layout.seg_local,
        bwd_layout.base, bwd_layout.src_local, bwd_layout.seg_local,
        fmeta, bmeta, exact, interpret,
    )
