"""Fused projection+attention-pool kernel (ops/bin_attnpool.py) vs the
unfused feature-major path.

Both runs force ``AIMNET_MP_MEGAKERNEL=interpret`` so the model takes the
feature-major (t_path) datapath on CPU; the fused attention-pool kernel is
then toggled via ``AIMNET_ATTNPOOL_KERNEL``.  Forward predictions,
attention weights, and ALL parameter gradients (including the learnable
temperature, whose fold lives outside the kernel) must match the unfused
formulation to fp tolerance in fp32 and bf16.
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
        num_graphs=27, mean_atoms=13, num_hops=3, num_tasks=2, seed=19
    )
    return bin_pack_batch(flat, ab=64, mb=16)


def _run_both(cfg, batch, grad=False, attn=False):
    """t_path on (megakernel interpret); fused attnpool off, then on."""
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    os.environ["AIMNET_ATTNPOOL_KERNEL"] = "0"
    try:
        params = model.init(jax.random.PRNGKey(0), batch)

        def fwd(p):
            out = model.apply(p, batch)
            mask = batch.graph_mask
            return jnp.sum(
                jnp.where(mask[:, None], out.predictions.astype(jnp.float32), 0.0)
                ** 2
            )

        def run(p):
            out = model.apply(p, batch)
            return out.attention_weights if attn else out.predictions

        if grad:
            ref = (fwd(params), jax.grad(fwd)(params))
        else:
            ref = run(params)
        os.environ["AIMNET_ATTNPOOL_KERNEL"] = "interpret"
        if grad:
            got = (fwd(params), jax.grad(fwd)(params))
        else:
            got = run(params)
    finally:
        os.environ.pop("AIMNET_ATTNPOOL_KERNEL", None)
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    return ref, got


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_forward_equality(binned_batch, dtype):
    cfg = _cfg(compute_dtype=dtype)
    ref, got = _run_both(cfg, binned_batch)
    mask = np.asarray(binned_batch.graph_mask)
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(ref)[mask], rtol=tol, atol=tol
    )


def test_attention_weights_equality(binned_batch):
    ref, got = _run_both(_cfg(), binned_batch, attn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_gradient_equality(binned_batch, dtype):
    cfg = _cfg(compute_dtype=dtype)
    (loss_ref, g_ref), (loss_got, g_got) = _run_both(cfg, binned_batch, grad=True)
    tol = 2e-4 if dtype == "float32" else 4e-2
    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=tol)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fg, _ = jax.flatten_util.ravel_pytree(g_got)
    fr, fg = np.asarray(fr), np.asarray(fg)
    scale = np.maximum(np.abs(fr).max(), 1e-6)
    np.testing.assert_allclose(
        fg / scale, fr / scale, atol=5e-3 if dtype == "float32" else 4e-2
    )


@pytest.mark.parametrize("act", ["relu", "gelu"])
def test_gradient_equality_activations(binned_batch, act):
    """The in-kernel act recompute (value + derivative) must match XLA
    autodiff for non-default activations too, incl. the predicate-grad
    paths (relu)."""
    cfg = _cfg(activation_type=act)
    (loss_ref, g_ref), (loss_got, g_got) = _run_both(cfg, binned_batch, grad=True)
    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=2e-4)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fg, _ = jax.flatten_util.ravel_pytree(g_got)
    fr, fg = np.asarray(fr), np.asarray(fg)
    scale = np.maximum(np.abs(fr).max(), 1e-6)
    np.testing.assert_allclose(fg / scale, fr / scale, atol=5e-3)


def test_temperature_gradient_flows(binned_batch):
    """The temperature fold happens outside the kernel — its gradient must
    survive the custom VJP and match the unfused path."""
    cfg = _cfg()
    (_, g_ref), (_, g_got) = _run_both(cfg, binned_batch, grad=True)
    t_ref = jax.tree_util.tree_leaves(
        {k: v for k, v in jax.tree_util.tree_flatten_with_path(g_ref)[0]
         if "temperature" in str(k)}
    )
    t_got = jax.tree_util.tree_leaves(
        {k: v for k, v in jax.tree_util.tree_flatten_with_path(g_got)[0]
         if "temperature" in str(k)}
    )
    assert t_ref and t_got
    for a, b in zip(t_ref, t_got):
        assert float(jnp.abs(a)) > 0
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3)


def test_multibin_groups(binned_batch):
    """Group sizes > 1 (several bins per grid step) must agree with G=1."""
    cfg = _cfg()
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    os.environ["AIMNET_ATTNPOOL_KERNEL"] = "interpret"
    try:
        params = model.init(jax.random.PRNGKey(0), binned_batch)

        def fwd(p):
            out = model.apply(p, binned_batch)
            return jnp.sum(out.predictions.astype(jnp.float32) ** 2)

        os.environ["AIMNET_ATTNPOOL_GROUP"] = "1"
        ref = (fwd(params), jax.grad(fwd)(params))
        nb = binned_batch.pool_mat.shape[0]
        g2 = next(g for g in (2, 3, 4) if nb % g == 0)
        os.environ["AIMNET_ATTNPOOL_GROUP"] = str(g2)
        got = (fwd(params), jax.grad(fwd)(params))
    finally:
        os.environ.pop("AIMNET_ATTNPOOL_GROUP", None)
        os.environ.pop("AIMNET_ATTNPOOL_KERNEL", None)
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(ref[1])
    fg, _ = jax.flatten_util.ravel_pytree(got[1])
    np.testing.assert_allclose(np.asarray(fg), np.asarray(fr), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_embed_fold_equality(binned_batch, dtype):
    """AIMNET_EMBED_FOLD=1 runs the embedding one-hot matmul inside BOTH
    fused kernels (attnpool + MP stack, the latter via the forced
    AIMNET_MP_PROJ=1 projection fold) from raw code rows; values and all
    gradients — including the four embedding tables, whose cotangent
    arrives via the block-diag d_bd — must match the fold-off path."""
    cfg = _cfg(compute_dtype=dtype)
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    os.environ["AIMNET_ATTNPOOL_KERNEL"] = "interpret"
    os.environ["AIMNET_MP_PROJ"] = "1"  # stack proj fold → stack embed fold
    os.environ["AIMNET_EMBED_FOLD"] = "0"
    try:
        params = model.init(jax.random.PRNGKey(0), binned_batch)

        def fwd(p):
            out = model.apply(p, binned_batch)
            mask = binned_batch.graph_mask
            return jnp.sum(
                jnp.where(mask[:, None], out.predictions.astype(jnp.float32), 0.0)
                ** 2
            )

        ref = (fwd(params), jax.grad(fwd)(params))
        os.environ["AIMNET_EMBED_FOLD"] = "1"
        got = (fwd(params), jax.grad(fwd)(params))
    finally:
        os.environ.pop("AIMNET_EMBED_FOLD", None)
        os.environ.pop("AIMNET_MP_PROJ", None)
        os.environ.pop("AIMNET_ATTNPOOL_KERNEL", None)
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=tol)
    fr, _ = jax.flatten_util.ravel_pytree(ref[1])
    fg, _ = jax.flatten_util.ravel_pytree(got[1])
    fr, fg = np.asarray(fr), np.asarray(fg)
    scale = np.maximum(np.abs(fr).max(), 1e-6)
    np.testing.assert_allclose(
        fg / scale, fr / scale, atol=2e-4 if dtype == "float32" else 4e-2
    )
