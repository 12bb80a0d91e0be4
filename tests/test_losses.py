"""Loss numerics vs hand-computed values (incl. evidential NIG NLL)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from aimnet_x2d_tpu.models.losses import (
    create_loss_function,
    evidential_params,
    l1_loss,
    weighted_l1_loss,
)


def test_l1_mean_over_all_elements():
    preds = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    tgts = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    mask = jnp.array([True, True])
    assert abs(float(l1_loss(preds, tgts, mask)) - 2.5) < 1e-6


def test_weighted_l1_sum_tasks_mean_batch():
    preds = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    tgts = jnp.zeros((2, 2))
    mask = jnp.array([True, True])
    loss = weighted_l1_loss([1.0, 2.0])(preds, tgts, mask)
    # per-sample: 1+4=5, 3+8=11 -> mean 8
    assert abs(float(loss) - 8.0) < 1e-6


def test_mask_excludes_padding():
    preds = jnp.array([[1.0], [100.0]])
    tgts = jnp.zeros((2, 1))
    mask = jnp.array([True, False])
    assert abs(float(l1_loss(preds, tgts, mask)) - 1.0) < 1e-6


def test_evidential_constraints():
    raw = jnp.array([[0.5, -3.0, -3.0, -3.0]])
    gamma, nu, alpha, beta = evidential_params(raw, 1)
    assert float(gamma[0, 0]) == 0.5
    assert float(nu[0, 0]) > 1.0 and float(alpha[0, 0]) > 1.0
    assert float(beta[0, 0]) > 0.0


def test_evidential_nll_hand_computed():
    """NLL with ν=α=softplus(0)+1, β=softplus(0); target=γ=0 ⇒ diff=0."""
    raw = jnp.zeros((1, 4))
    tgts = jnp.zeros((1, 1))
    mask = jnp.array([True])
    sp0 = math.log(2.0)  # softplus(0)
    nu = alpha = sp0 + 1.0
    beta = sp0
    nll = (
        0.5 * math.log(math.pi / nu)
        - alpha * math.log(2 * beta)
        + math.lgamma(alpha)
        - math.lgamma(alpha + 0.5)
        + (alpha + 0.5) * math.log(beta)
    )
    reg = 1.0 * (2 * beta + alpha)
    loss = create_loss_function("evidential")(raw, tgts, mask)
    assert abs(float(loss) - (nll + reg)) < 1e-5


def test_evidential_penalizes_error():
    good = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    bad = jnp.array([[5.0, 0.0, 0.0, 0.0]])
    tgts = jnp.zeros((1, 1))
    mask = jnp.array([True])
    fn = create_loss_function("evidential")
    assert float(fn(bad, tgts, mask)) > float(fn(good, tgts, mask))


def test_factory_dispatch():
    assert create_loss_function("l1") is l1_loss
    w = create_loss_function("l1", "multitask", [1.0, 1.0])
    assert w is not l1_loss
    with pytest.raises(ValueError):
        create_loss_function("nope")
