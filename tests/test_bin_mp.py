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


# --------------------------------------------------------------------- #
# In-kernel dropout (hash-RNG): semantics verified with crafted identity
# weights that make the mask directly observable in the output.
# --------------------------------------------------------------------- #


def _identity_stack(x, seed, rate, interpret=True):
    """1-layer stack, relu, identity weights, zero adjacency:
    out = x·mask/keep + 2x  (block chain + block residual + stack residual),
    so mask = (out − 2x)·keep/x elementwise."""
    from aimnet_x2d_tpu.ops.bin_mp import binned_mp_stack

    nb, ab, D = 2, 16, 64
    adj = jnp.zeros((nb, ab, ab), jnp.int8)
    I = jnp.eye(D, dtype=jnp.float32)
    Z = jnp.zeros((D, D), jnp.float32)
    z = jnp.zeros((D,), jnp.float32)
    ws = (I, Z, z, Z, Z, z, I, z, I, z)  # w_in0=I, block w1=w2=I, rest 0
    return binned_mp_stack(
        x.reshape(nb * ab, D),
        adj,
        (ws,),
        act="relu",
        num_mlp_layers=1,
        compute_dtype=jnp.float32,
        interpret=interpret,
        dropout=rate,
        drop_seed=seed,
    ).reshape(nb, ab, D)


def test_dropout_mask_semantics():
    rate = 0.3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (2, 16, 64)), jnp.float32)
    seed = jnp.array([1234], jnp.int32)
    out = np.asarray(_identity_stack(x, seed, rate))
    mask = (out - 2 * np.asarray(x)) * (1 - rate) / np.asarray(x)
    # every element is exactly kept (1) or dropped (0)
    np.testing.assert_allclose(
        mask, np.round(mask), atol=1e-5
    )
    keep_rate = float(np.round(mask).mean())
    assert abs(keep_rate - (1 - rate)) < 0.03, keep_rate
    # reproducible for the same seed, different for another seed
    out2 = np.asarray(_identity_stack(x, seed, rate))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(_identity_stack(x, jnp.array([99], jnp.int32), rate))
    assert not np.array_equal(out, out3)


def test_dropout_backward_mask_matches_forward():
    """jax.grad through the stack must see the SAME masks the forward drew
    (the backward kernel regenerates them from the same hash)."""
    rate = 0.25
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.5, 1.5, (2, 16, 64)), jnp.float32)
    seed = jnp.array([77], jnp.int32)
    out = np.asarray(_identity_stack(x, seed, rate))
    mask = np.round((out - 2 * np.asarray(x)) * (1 - rate) / np.asarray(x))
    g = jax.grad(lambda v: jnp.sum(_identity_stack(v, seed, rate)))(x)
    # d out / d x = mask/keep + 2 elementwise (identity chains, relu'=1)
    np.testing.assert_allclose(
        np.asarray(g), mask / (1 - rate) + 2.0, rtol=1e-5, atol=1e-5
    )


def test_dropout_model_train_mode(binned_batch):
    """Train-mode apply with dropout engages the stacked kernel and gives
    different outputs for different dropout rngs, identical for the same."""
    cfg = _cfg(shell_conv_dropout=0.2)
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    try:
        params = model.init(jax.random.PRNGKey(0), binned_batch)

        def run(key):
            return model.apply(
                params, binned_batch, deterministic=False,
                rngs={"dropout": key},
            ).predictions

        a = np.asarray(run(jax.random.PRNGKey(1)))
        b = np.asarray(run(jax.random.PRNGKey(1)))
        c = np.asarray(run(jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
    finally:
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)


def test_proj_fold_equality(binned_batch):
    """The in-kernel x_other projection (AIMNET_MP_PROJ, default on) must
    match the XLA-projection + stack path exactly: values and all grads."""
    cfg = _cfg()
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    os.environ["AIMNET_MP_PROJ"] = "0"
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
        os.environ["AIMNET_MP_PROJ"] = "1"
        got = (fwd(params), jax.grad(fwd)(params))
    finally:
        os.environ.pop("AIMNET_MP_PROJ", None)
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(ref[1])
    fg, _ = jax.flatten_util.ravel_pytree(got[1])
    fr, fg = np.asarray(fr), np.asarray(fg)
    scale = np.maximum(np.abs(fr).max(), 1e-6)
    np.testing.assert_allclose(fg / scale, fr / scale, atol=1e-4)


def test_dropout_per_layer_megakernel(binned_batch):
    """Per-layer megakernel path (charges+stereo config) with training
    dropout: in-kernel hash dropout engages, layers draw path-distinct
    masks (flax make_rng), grads are finite, and rate=0 training equals
    the deterministic forward."""
    cfg = _cfg(
        use_partial_charges=True, use_stereochemistry=True,
        shell_conv_dropout=0.2,
    )
    model = GNN(cfg)
    os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
    try:
        params = model.init(jax.random.PRNGKey(0), binned_batch)

        def run(key):
            return model.apply(
                params, binned_batch, deterministic=False,
                rngs={"dropout": key},
            ).predictions

        a = np.asarray(run(jax.random.PRNGKey(1)))
        b = np.asarray(run(jax.random.PRNGKey(1)))
        c = np.asarray(run(jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

        # gradient flows through the in-kernel dropout
        def loss(p):
            out = model.apply(
                p, binned_batch, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)},
            ).predictions
            return jnp.sum(out**2)

        g = jax.grad(loss)(params)
        flat, _ = jax.flatten_util.ravel_pytree(g)
        assert np.all(np.isfinite(np.asarray(flat)))

        # rate-0 training mode equals the deterministic forward exactly
        cfg0 = _cfg(
            use_partial_charges=True, use_stereochemistry=True,
            shell_conv_dropout=0.0,
        )
        m0 = GNN(cfg0)
        p0 = m0.init(jax.random.PRNGKey(0), binned_batch)
        det = np.asarray(
            m0.apply(p0, binned_batch, deterministic=True).predictions
        )
        trn = np.asarray(
            m0.apply(
                p0, binned_batch, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(4)},
            ).predictions
        )
        np.testing.assert_array_equal(det, trn)
    finally:
        os.environ.pop("AIMNET_MP_MEGAKERNEL", None)


class TestFusedInject:
    """Round-5 fused inject kernel (ops/bin_inject.py): charge-eq +
    stereo + layer + residual as one op must match the round-3/4 XLA
    inject path (itself parity-proven against the reference semantics)
    for forward and ALL gradients, on batches WITH real stereo content."""

    @pytest.fixture(scope="class")
    def stereo_batch(self):
        flat = make_synthetic_batch(
            num_graphs=29, mean_atoms=14, num_hops=3, num_tasks=2, seed=11,
            with_stereo=True,
        )
        return bin_pack_batch(flat, ab=64, mb=16)

    def _run_both(self, cfg, batch, grad=True):
        model = GNN(cfg)
        os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
        os.environ.pop("AIMNET_INJECT_FUSED", None)
        try:
            params = model.init(jax.random.PRNGKey(0), batch)

            def fwd(p):
                out = model.apply(p, batch)
                mask = batch.graph_mask
                return jnp.sum(
                    jnp.where(
                        mask[:, None], out.predictions.astype(jnp.float32), 0.0
                    )
                    ** 2
                )

            os.environ["AIMNET_INJECT_FUSED"] = "0"
            ref = (fwd(params), jax.grad(fwd)(params)) if grad else fwd(params)
            os.environ["AIMNET_INJECT_FUSED"] = "interpret"
            got = (fwd(params), jax.grad(fwd)(params)) if grad else fwd(params)
        finally:
            os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
            os.environ.pop("AIMNET_INJECT_FUSED", None)
        return ref, got

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_forward_and_grads(self, stereo_batch, dtype):
        cfg = _cfg(
            use_partial_charges=True, use_stereochemistry=True,
            compute_dtype=dtype,
        )
        (loss_ref, g_ref), (loss_got, g_got) = self._run_both(cfg, stereo_batch)
        tol = 2e-4 if dtype == "float32" else 4e-2
        np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=tol)
        fr, _ = jax.flatten_util.ravel_pytree(g_ref)
        fg, _ = jax.flatten_util.ravel_pytree(g_got)
        fr, fg = np.asarray(fr), np.asarray(fg)
        scale = np.maximum(np.abs(fr).max(), 1e-6)
        np.testing.assert_allclose(
            fg / scale, fr / scale, atol=6e-3 if dtype == "float32" else 4e-2
        )

    def test_with_dropout_trains(self, stereo_batch):
        # dropout path: seeds thread through; loss is finite and grads flow
        cfg = _cfg(
            use_partial_charges=True, use_stereochemistry=True,
            shell_conv_dropout=0.1,
        )
        model = GNN(cfg)
        os.environ["AIMNET_MP_MEGAKERNEL"] = "interpret"
        os.environ["AIMNET_INJECT_FUSED"] = "interpret"
        try:
            params = model.init(jax.random.PRNGKey(0), stereo_batch)

            def fwd(p):
                out = model.apply(
                    p, stereo_batch, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)},
                )
                return jnp.sum(out.predictions.astype(jnp.float32) ** 2)

            loss, grads = jax.value_and_grad(fwd)(params)
            assert np.isfinite(float(loss))
            flat, _ = jax.flatten_util.ravel_pytree(grads)
            assert np.isfinite(np.asarray(flat)).all()
            assert float(jnp.abs(flat).max()) > 0
        finally:
            os.environ.pop("AIMNET_MP_MEGAKERNEL", None)
            os.environ.pop("AIMNET_INJECT_FUSED", None)

    def test_no_stereo_rows_batch(self, ):
        # a charges+stereo MODEL on a batch with zero tet/cis/trans rows
        # (any_tet false) must still agree between paths
        flat = make_synthetic_batch(
            num_graphs=17, mean_atoms=12, num_hops=3, num_tasks=2, seed=5,
            with_stereo=False,
        )
        batch = bin_pack_batch(flat, ab=64, mb=16)
        cfg = _cfg(use_partial_charges=True, use_stereochemistry=True)
        (loss_ref, g_ref), (loss_got, g_got) = self._run_both(cfg, batch)
        np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=2e-4)
        fr, _ = jax.flatten_util.ravel_pytree(g_ref)
        fg, _ = jax.flatten_util.ravel_pytree(g_got)
        scale = np.maximum(np.abs(np.asarray(fr)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(fg) / scale, np.asarray(fr) / scale, atol=6e-3
        )
