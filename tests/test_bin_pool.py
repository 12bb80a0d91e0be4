"""Fused attention-pool Pallas kernel (ops/bin_pool.py) vs the unfused
binned jnp formulation.

Same contract as the MP megakernel tests: identical params and batches,
forward outputs, attention weights, and ALL parameter/activation gradients
must match the unfused path to fp tolerance, in fp32 and bf16.  Tests force
``AIMNET_POOL_KERNEL=interpret`` so the kernel math runs on CPU.
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
        num_graphs=23, mean_atoms=13, num_hops=3, num_tasks=2, seed=11
    )
    return bin_pack_batch(flat, ab=64, mb=16)


def _run_both(cfg, batch, grad=False, attn=False):
    model = GNN(cfg)
    os.environ["AIMNET_POOL_KERNEL"] = "0"
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
        os.environ["AIMNET_POOL_KERNEL"] = "interpret"
        if grad:
            got = (fwd(params), jax.grad(fwd)(params))
        else:
            got = run(params)
    finally:
        os.environ.pop("AIMNET_POOL_KERNEL", None)
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
        assert float(jnp.abs(a)) > 0  # gradient actually flows
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3)


def test_wpool_kernel_matches_einsum():
    """Flat weighted-pool kernel (ops/bin_wpool.py) == the einsum path,
    values and gradients, in interpret mode on CPU."""
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.ops.bin_wpool import binned_wpool_t

    rng = np.random.default_rng(3)
    nb, mb, ab, D = 4, 6, 32, 24
    A = nb * ab
    x = jnp.asarray(rng.normal(size=(D, A)), jnp.float32)
    w = jnp.asarray(rng.random(A), jnp.float32)
    pm = np.zeros((nb, mb, ab), np.int8)
    for b in range(nb):
        for a in range(ab):
            m = rng.integers(0, mb + 2)
            if m < mb:
                pm[b, m, a] = 1
    pm = jnp.asarray(pm)

    def ref(x, w):
        return jnp.einsum(
            "dba,bma->dbm", (x * w[None]).reshape(D, nb, ab),
            pm.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).reshape(D, nb * mb)

    def ker(x, w):
        return binned_wpool_t(x, w, pm, interpret=True)

    np.testing.assert_allclose(
        np.asarray(ker(x, w)), np.asarray(ref(x, w)), rtol=1e-6, atol=1e-6
    )
    g = jnp.asarray(rng.normal(size=(D, nb * mb)), jnp.float32)
    gr_ref = jax.grad(lambda x, w: jnp.vdot(ref(x, w), g), argnums=(0, 1))(x, w)
    gr_ker = jax.grad(lambda x, w: jnp.vdot(ker(x, w), g), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gr_ker[0]), np.asarray(gr_ref[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gr_ker[1]), np.asarray(gr_ref[1]), rtol=1e-5, atol=1e-5
    )


def test_wpool_kernel_multitile_rows():
    """d > 128 exercises the 2-d grid (feature-row tiles) including the
    dw accumulation across row tiles and the partial last tile."""
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.ops.bin_wpool import binned_wpool_t

    rng = np.random.default_rng(9)
    nb, mb, ab, D = 2, 8, 32, 300  # 3 row tiles (128, 128, 44)
    A = nb * ab
    x = jnp.asarray(rng.normal(size=(D, A)), jnp.float32)
    w = jnp.asarray(rng.random(A), jnp.float32)
    pm = np.zeros((nb, mb, ab), np.int8)
    for b in range(nb):
        for a in range(ab):
            pm[b, rng.integers(0, mb), a] = 1
    pm = jnp.asarray(pm)

    def ref(x, w):
        return jnp.einsum(
            "dba,bma->dbm", (x * w[None]).reshape(D, nb, ab),
            pm.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).reshape(D, nb * mb)

    def ker(x, w):
        return binned_wpool_t(x, w, pm, interpret=True)

    np.testing.assert_allclose(
        np.asarray(ker(x, w)), np.asarray(ref(x, w)), rtol=1e-6, atol=1e-6
    )
    g = jnp.asarray(rng.normal(size=(D, nb * mb)), jnp.float32)
    gr_ref = jax.grad(lambda x, w: jnp.vdot(ref(x, w), g), argnums=(0, 1))(x, w)
    gr_ker = jax.grad(lambda x, w: jnp.vdot(ker(x, w), g), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gr_ker[0]), np.asarray(gr_ref[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gr_ker[1]), np.asarray(gr_ref[1]), rtol=1e-5, atol=1e-5
    )
