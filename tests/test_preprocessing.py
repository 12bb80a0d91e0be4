"""Preprocessing numerics: SAE lstsq, StandardScaler (ddof=1, eps),
pipeline round-trip and serialization."""

import numpy as np
import pytest

from aimnet_x2d_tpu.data.preprocessing import (
    PreprocessingConfig,
    PreprocessingPipeline,
    SAENormalizer,
    StandardScaler,
    compute_sae_dict,
)


def test_sae_exact_recovery():
    """Targets that ARE additive in composition must be recovered exactly."""
    rng = np.random.default_rng(0)
    true_offsets = {1: -0.5, 6: -38.0, 8: -75.0}
    nums, targets = [], []
    for _ in range(200):
        n_c = rng.integers(1, 6)
        n_o = rng.integers(0, 3)
        n_h = rng.integers(0, 10)
        comp = [6] * n_c + [8] * n_o + [1] * n_h
        nums.append(np.array(comp, np.int32))
        targets.append(sum(true_offsets[z] for z in comp) + rng.normal(0, 1e-6))
    sae = compute_sae_dict(nums, targets)
    for z, v in true_offsets.items():
        assert abs(sae[z] - v) < 1e-3

    norm = SAENormalizer("regression")
    norm.sae_statistics = {"regression": sae}
    norm.is_fitted = True
    shifted = norm.transform(nums, np.array(targets))
    assert np.abs(shifted).max() < 1e-2


def test_sae_percentile_filter():
    """Outliers beyond the 2-98 percentile must not skew the fit."""
    rng = np.random.default_rng(1)
    nums = [np.array([6] * int(rng.integers(1, 10)), np.int32) for _ in range(200)]
    targets = np.array([-10.0 * len(n) for n in nums])
    targets[:3] = 1e6  # wild outliers
    sae = compute_sae_dict(nums, targets)
    assert abs(sae[6] + 10.0) < 1.0


def test_standard_scaler_ddof1():
    data = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
    sc = StandardScaler()
    out = sc.fit_transform(data)
    assert abs(sc.stds[0] - np.std(data, ddof=1)) < 1e-6
    np.testing.assert_allclose(sc.inverse_transform(out), data, rtol=1e-5)


def test_standard_scaler_zero_variance():
    data = np.full((5, 2), 3.0, np.float32)
    sc = StandardScaler()
    sc.fit(data)
    assert np.all(sc.stds == 1.0)  # <1e-12 → 1.0 guard


def test_pipeline_order_and_inverse():
    rng = np.random.default_rng(2)
    nums = [np.array([6, 6, 1, 1, 1, 1], np.int32) for _ in range(50)]
    targets = rng.normal(-80, 5, size=(50, 1))
    cfg = PreprocessingConfig(apply_sae=True, apply_standard_scaling=True)
    pipe = PreprocessingPipeline(cfg)
    out = pipe.fit_transform(nums, targets)
    # scaled output: ~zero mean, unit std
    assert abs(out.mean()) < 1e-5
    assert abs(out.std(ddof=1) - 1.0) < 1e-5
    # inverse undoes scaling only (SAE shift remains)
    inv = pipe.inverse_transform(out)
    sae_shifted = pipe.sae_normalizer.transform(nums, targets)
    np.testing.assert_allclose(inv, sae_shifted, rtol=1e-4)


def test_pipeline_serialization_roundtrip():
    rng = np.random.default_rng(3)
    nums = [np.array([6, 8, 1], np.int32) for _ in range(30)]
    targets = rng.normal(size=(30, 2))
    cfg = PreprocessingConfig(
        apply_sae=True, sae_subtasks=[1], task_type="multitask"
    )
    pipe = PreprocessingPipeline(cfg)
    pipe.fit(nums, targets)
    d = pipe.state_dict()
    pipe2 = PreprocessingPipeline.from_state_dict(d)
    np.testing.assert_allclose(
        pipe.transform(nums, targets), pipe2.transform(nums, targets), rtol=1e-6
    )


def test_multitask_sae_subtask_bounds():
    nums = [np.array([6], np.int32)] * 10
    targets = np.zeros((10, 2))
    norm = SAENormalizer("multitask")
    with pytest.raises(ValueError):
        norm.fit(nums, targets, subtasks=[5])
    with pytest.raises(ValueError):
        norm.fit(nums, targets, subtasks=None)
