"""Pallas windowed segment-sum: layout + kernel (interpreter mode) vs the
XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.ops import segment_sum
from aimnet_x2d_tpu.ops.pallas_segment import (
    pallas_windowed_segment_sum,
    windowed_layout,
)


def _random_edges(rng, A, E):
    src = rng.integers(0, A, E).astype(np.int32)
    dst = rng.integers(0, A, E).astype(np.int32)
    mask = rng.random(E) < 0.9
    return src, dst, mask


def test_windowed_layout_covers_all_edges(rng):
    A, E = 100, 400
    src, dst, mask = _random_edges(rng, A, E)
    src_perm, seg_local, W, cap = windowed_layout(src, dst, mask, A, window=32, chunk=16)
    assert W == 4  # ceil(100/32)
    assert cap % 16 == 0
    real = seg_local < 32
    assert real.sum() == mask.sum()
    # reconstruct global dst and compare multisets of (src, dst) pairs
    win_idx = np.arange(W * cap) // cap
    gdst = win_idx * 32 + seg_local
    got = sorted(zip(src_perm[real].tolist(), gdst[real].tolist()))
    want = sorted(zip(src[mask].tolist(), dst[mask].tolist()))
    assert got == want


@pytest.mark.parametrize("A,E,D", [(96, 300, 128), (256, 1024, 128)])
def test_kernel_matches_xla(rng, A, E, D):
    src, dst, mask = _random_edges(rng, A, E)
    x = rng.normal(size=(A, D)).astype(np.float32)

    expected = np.asarray(
        segment_sum(
            jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(x)[jnp.asarray(src)], 0.0),
            jnp.asarray(np.where(mask, dst, A)),
            A,
        )
    )

    window = chunk = 32 if A <= 96 else 64
    src_perm, seg_local, W, cap = windowed_layout(
        src, dst, mask, A, window=window, chunk=chunk
    )
    got = pallas_windowed_segment_sum(
        jnp.asarray(x),
        jnp.asarray(src_perm),
        jnp.asarray(seg_local),
        A,
        W,
        cap,
        window=window,
        chunk=chunk,
        interpret=True,  # CPU test: interpreter mode
    )
    np.testing.assert_allclose(np.asarray(got)[:A], expected, rtol=1e-5, atol=1e-5)
