"""Segment-op unit tests against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.ops import segment_max, segment_mean, segment_softmax, segment_sum


def _np_segment_sum(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], data.dtype)
    for i, s in enumerate(ids):
        if 0 <= s < n:
            out[s] += data[i]
    return out


def test_segment_sum_matches_oracle(rng):
    data = rng.normal(size=(50, 7)).astype(np.float32)
    ids = rng.integers(0, 10, size=50).astype(np.int32)
    got = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 10))
    np.testing.assert_allclose(got, _np_segment_sum(data, ids, 10), rtol=1e-5)


def test_segment_sum_drops_out_of_range(rng):
    """Padding convention: id == num_segments must vanish (under jit)."""
    data = np.ones((4, 3), np.float32)
    ids = np.array([0, 1, 5, 5], np.int32)
    got = np.asarray(jax.jit(lambda d, i: segment_sum(d, i, 5))(data, ids))
    assert got[0].sum() == 3.0 and got[1].sum() == 3.0
    assert got[2:].sum() == 0.0


def test_segment_mean_empty_segment_is_zero(rng):
    data = rng.normal(size=(6, 2)).astype(np.float32)
    ids = np.array([0, 0, 0, 2, 2, 2], np.int32)
    got = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 4))
    np.testing.assert_allclose(got[0], data[:3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[2], data[3:].mean(0), rtol=1e-5)
    assert np.all(got[1] == 0) and np.all(got[3] == 0)


def test_segment_max_empty_value():
    data = np.array([[1.0, -2.0], [3.0, -4.0]], np.float32)
    ids = np.array([1, 1], np.int32)
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 3))
    np.testing.assert_allclose(got[1], [3.0, -2.0])
    # empty segments give 0 like torch_scatter's zero-filled output buffer
    assert np.all(got[0] == 0) and np.all(got[2] == 0)


def test_segment_softmax_matches_dense(rng):
    scores = rng.normal(size=(4, 12)).astype(np.float32)  # (heads, atoms)
    ids = np.repeat(np.arange(3), 4).astype(np.int32)
    got = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 3))
    for h in range(4):
        for g in range(3):
            sel = ids == g
            ref = np.exp(scores[h, sel] - scores[h, sel].max())
            ref = ref / ref.sum()
            np.testing.assert_allclose(got[h, sel], ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda s: segment_sum(s, jnp.asarray(ids), 3))(jnp.asarray(got))),
        np.ones((4, 3)),
        rtol=1e-5,
    )


def test_segment_softmax_mask(rng):
    scores = rng.normal(size=(8,)).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 2, 2, 2], np.int32)
    mask = np.array([1, 1, 0, 1, 1, 1, 1, 1], bool)
    got = np.asarray(
        segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 3, mask=jnp.asarray(mask))
    )
    assert got[2] == 0.0
    np.testing.assert_allclose(got[:2].sum(), 1.0, rtol=1e-5)
