"""MP-layer Pallas megakernel (ops/bin_mp.py) vs the unfused binned path.

The megakernel must be a pure fusion: on identical binned batches and
identical params, forward outputs and ALL gradients (params + activations)
must match the unfused XLA einsum formulation to fp tolerance, in both
fp32 and bf16 compute modes, for every supported activation.  Tests force
``AIMNET_MP_MEGAKERNEL=interpret`` so the kernel math runs on CPU.
"""

import os

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.data.binning import bin_pack_batch
from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
from aimnet_x2d_tpu.models import GNN, GNNConfig


def _cfg(**kw):
    base = dict(
        hidden_dim=64,
        output_dim=2,
        num_shells=3,
        num_message_passing_layers=2,
        embedding_dim=8,
        ffn_num_layers=2,
        pooling_type="attention",
        task_type="multitask",
        shell_conv_dropout=0.0,
        ffn_dropout=0.0,
    )
    base.update(kw)
    return GNNConfig(**base)


@pytest.fixture(scope="module")
def binned_batch():
    flat = make_synthetic_batch(
        num_graphs=29, mean_atoms=14, num_hops=3, num_tasks=2, seed=7
    )
    return bin_pack_batch(flat, ab=64, mb=16)


def _run_both(cfg, batch, grad=False):
    """Apply the model with the megakernel off, then forced-on (interpret)."""
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "0"
    try:
        params = model.init(jax.random.PRNGKey(0), batch)

        def fwd(p):
            out = model.apply(p, batch)
            mask = batch.graph_mask
            return jnp.sum(
                jnp.where(mask[:, None], out.predictions.astype(jnp.float32), 0.0)
                ** 2
            )

        def preds(p):
            return model.apply(p, batch).predictions

        if grad:
            ref = (fwd(params), jax.grad(fwd)(params))
        else:
            ref = preds(params)
        os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
        if grad:
            got = (fwd(params), jax.grad(fwd)(params))
        else:
            got = preds(params)
    finally:
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    return ref, got


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_forward_equality(binned_batch, dtype):
    cfg = _cfg(compute_dtype=dtype)
    ref, got = _run_both(cfg, binned_batch)
    mask = np.asarray(binned_batch.graph_mask)
    r, g = np.asarray(ref)[mask], np.asarray(got)[mask]
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(g, r, rtol=tol, atol=tol)


@pytest.mark.parametrize("act", ["relu", "gelu", "elu", "leakyrelu"])
def test_forward_equality_activations(binned_batch, act):
    cfg = _cfg(activation_type=act)
    ref, got = _run_both(cfg, binned_batch)
    mask = np.asarray(binned_batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(ref)[mask], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_gradient_equality(binned_batch, dtype):
    cfg = _cfg(compute_dtype=dtype)
    (loss_ref, g_ref), (loss_got, g_got) = _run_both(cfg, binned_batch, grad=True)
    tol = 2e-4 if dtype == "float32" else 4e-2
    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=tol)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fg, _ = jax.flatten_util.ravel_pytree(g_got)
    fr, fg = np.asarray(fr), np.asarray(fg)
    # relative comparison on the joint scale (bf16 grads carry rounding)
    scale = np.maximum(np.abs(fr).max(), 1e-6)
    np.testing.assert_allclose(fg / scale, fr / scale, atol=5e-3 if dtype == "float32" else 4e-2)


def test_gradient_equality_charges_stereo(binned_batch):
    """Megakernel composes with the charge-eq / stereo pre-steps (they run
    outside the kernel, between layers)."""
    cfg = _cfg(use_partial_charges=True, use_stereochemistry=True)
    (loss_ref, g_ref), (loss_got, g_got) = _run_both(cfg, binned_batch, grad=True)
    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=1e-4)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fg, _ = jax.flatten_util.ravel_pytree(g_got)
    scale = np.maximum(np.abs(np.asarray(fr)).max(), 1e-6)
    np.testing.assert_allclose(
        np.asarray(fg) / scale, np.asarray(fr) / scale, atol=5e-3
    )


def test_param_tree_identical(binned_batch):
    """Both paths must declare the exact same parameter tree (names,
    shapes, and init values) so checkpoints are interchangeable."""
    cfg = _cfg()
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "0"
    try:
        p_ref = model.init(jax.random.PRNGKey(3), binned_batch)
        os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
        p_got = model.init(jax.random.PRNGKey(3), binned_batch)
    finally:
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    fr, _ = jax.flatten_util.ravel_pytree(p_ref)
    fg, _ = jax.flatten_util.ravel_pytree(p_got)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_got)
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(fg))
