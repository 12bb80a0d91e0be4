"""Pallas TPU segment-sum kernel over a windowed-CSR edge layout.

The hot op of this framework is the edge aggregation
``out[dst] += x[src]`` (reference torch_scatter scatter_add;
src/models/layers.py:158-163).  This module provides a hand-written Pallas
implementation structured for the MXU:

1.  The host lays edges out in *atom windows*: atoms are grouped into
    windows of ``AW`` consecutive slots; each window's incoming edges are
    padded to a common cap (``windowed_layout``).  This is a blocked-CSR /
    ELL hybrid chosen so every kernel index map is static.
2.  The kernel runs a 2-D grid (window, edge-chunk).  Each step builds a
    one-hot (AW × EB) matrix from the local segment ids and contracts it
    with the (EB × D) gathered source features on the MXU, accumulating
    into the window's (AW × D) output block in VMEM (revisited across the
    inner grid dimension).

Measured on TPU v5e (benchmarks/pallas_vs_xla.py, A=20480, E=111k, D=256):
- XLA fused gather+where+scatter:      0.028 ms (~4.0 G edges/s)
- this kernel, exact fp32 MXU passes:  0.031 ms (~3.6 G edges/s, max
  |diff| vs XLA 2e-6)
- this kernel, default MXU precision:  0.026 ms (operands rounded to bf16)

Both paths are memory-bandwidth-bound and within noise of each other, so
the model defaults to the XLA path (ops/segment.py) which needs no edge
re-layout.  The kernel is kept validated (tests run it in interpreter
mode) as the foundation for fused-layer kernels and for backends with
weaker scatter codegen.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def windowed_layout(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_mask: np.ndarray,
    num_atoms: int,
    window: int = 256,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Host-side regrouping of edges by destination atom window.

    Returns (src_perm, seg_local, num_windows, cap):
    - ``src_perm``  (W*cap,) int32: source atom per slot (0 for padding)
    - ``seg_local`` (W*cap,) int32: dst − window_base per slot, ``window``
      for padding slots (one past the local range ⇒ masked in-kernel)
    - cap is the per-window edge capacity, rounded up to ``chunk``.
    """
    W = -(-num_atoms // window)
    src = np.asarray(edge_src)[np.asarray(edge_mask)]
    dst = np.asarray(edge_dst)[np.asarray(edge_mask)]
    win_of = dst // window
    order = np.argsort(win_of, kind="stable")
    src, dst, win_of = src[order], dst[order], win_of[order]
    counts = np.bincount(win_of, minlength=W)
    cap = int(max(counts.max() if counts.size else 1, 1))
    cap = -(-cap // chunk) * chunk

    src_perm = np.zeros(W * cap, np.int32)
    seg_local = np.full(W * cap, window, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for w in range(W):
        n = counts[w]
        if n:
            sl = slice(w * cap, w * cap + n)
            src_perm[sl] = src[starts[w] : starts[w] + n]
            seg_local[sl] = dst[starts[w] : starts[w] + n] - w * window
    return src_perm, seg_local, W, cap


def _segment_kernel(seg_ref, data_ref, out_ref, *, window: int, chunk: int, exact: bool):
    from jax.experimental import pallas as pl

    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    seg = seg_ref[0, 0, :]  # (EB,) local segment ids, `window` = padding
    rows = jax.lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    onehot = (rows == seg[None, :]).astype(jnp.float32)  # (AW, EB)
    # exact=True keeps true-fp32 MXU passes (one-hot weights are exact in
    # bf16, but the *data* operand would be rounded at default precision)
    out_ref[:, :] += jnp.dot(
        onehot,
        data_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT,
    )


def pallas_windowed_segment_sum(
    x: jax.Array,
    src_perm: jax.Array,
    seg_local: jax.Array,
    num_atoms: int,
    num_windows: int,
    cap: int,
    window: int = 256,
    chunk: int = 256,
    exact: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """out[a] = Σ_{edges e with dst(e)=a} x[src(e)] via the windowed layout.

    ``x`` is (A, D) float32; returns (W*window, D) — slice [:A] for the
    per-atom sums.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = x.shape[1]
    data = jnp.where(
        (seg_local < window)[:, None], x[src_perm], 0.0
    )  # (W*cap, D) gathered on the XLA side

    # (G, 1, chunk): the trailing two dims match the block shape exactly,
    # satisfying the TPU (8, 128) tiling rule for int32 blocks.
    seg3d = seg_local.reshape(num_windows * (cap // chunk), 1, chunk)
    grid = (num_windows, cap // chunk)

    out = pl.pallas_call(
        functools.partial(_segment_kernel, window=window, chunk=chunk, exact=exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda w, c: (w * (cap // chunk) + c, 0, 0)),
            pl.BlockSpec((chunk, D), lambda w, c: (w * (cap // chunk) + c, 0)),
        ],
        out_specs=pl.BlockSpec((window, D), lambda w, c: (w, 0)),
        out_shape=jax.ShapeDtypeStruct((num_windows * window, D), jnp.float32),
        interpret=interpret,
    )(seg3d, data)
    return out
